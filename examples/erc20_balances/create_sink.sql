-- balances sink (reference:
-- examples/ethereum_token_erc20_balances/create_table.sql:1-16)
CREATE TABLE IF NOT EXISTS {{.SINK_TABLE}} (
    timestamp      TIMESTAMP,
    block_hash     BINARY,
    block_number   BIGINT,
    wallet_address BINARY,
    token_address  BINARY,
    token_symbol   STRING,
    token_decimals TINYINT,
    raw_balance    DECIMAL(38,0),
    balance        DOUBLE,
    month          STRING
)
USING PARQUET
PARTITIONED BY (month)
LOCATION '{{.TARGET_PATH}}'
