-- drop the batch buffer (reference: examples/ethereum_blocks/delete_buffer.sql:1)
DROP VIEW IF EXISTS buffer_{{.START}}_{{.END}}
