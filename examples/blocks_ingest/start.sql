-- resume point: one past the newest ingested block; NULL on empty sink
-- (reference: examples/ethereum_blocks/start.sql:1-3)
SELECT max(number) + 1 AS start FROM {{.SINK_TABLE}}
