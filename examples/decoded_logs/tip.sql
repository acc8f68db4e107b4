-- source-driven tip (reference: examples/ethereum_decoded_logs/tip.sql:1-3)
SELECT max(block_number) AS tip FROM {{.SOURCE_TABLE}}
