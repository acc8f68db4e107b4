SELECT max(block_number) + 1 AS start FROM {{.SINK_TABLE}}
