SELECT max(block_number) AS tip FROM {{.SOURCE_TABLE}}
