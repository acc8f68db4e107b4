-- ordered append into the sink (reference:
-- examples/ethereum_blocks/write_to_sink.sql:1-2); runs after the
-- sequencer, so commits land in block order
INSERT INTO {{.SINK_TABLE}}
SELECT * FROM buffer_{{.START}}_{{.END}}
