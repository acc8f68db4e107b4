-- transactions sink (subset of reference
-- examples/ethereum_transactions/create_table.sql:1-33)
CREATE TABLE IF NOT EXISTS {{.SINK_TABLE}} (
    timestamp           TIMESTAMP,
    block_hash          BINARY,
    block_number        BIGINT,
    hash                BINARY,
    transaction_index   INT,
    `from`              BINARY,
    `to`                BINARY,
    value               DECIMAL(38,0),
    gas                 BIGINT,
    gas_used            BIGINT,
    cumulative_gas_used BIGINT,
    effective_gas_price DECIMAL(38,0),
    nonce               BIGINT,
    input               BINARY,
    type                INT,
    status              TINYINT,
    month               STRING
)
USING PARQUET
PARTITIONED BY (month)
LOCATION '{{.TARGET_PATH}}'
