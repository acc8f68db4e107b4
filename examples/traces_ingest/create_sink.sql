-- traces sink (subset of reference examples/ethereum_traces/create_table.sql:1-59)
CREATE TABLE IF NOT EXISTS {{.SINK_TABLE}} (
    timestamp            TIMESTAMP,
    block_hash           BINARY,
    block_number         BIGINT,
    transaction_hash     BINARY,
    transaction_position INT,
    transaction_status   TINYINT,
    subtraces            INT,
    trace_address        ARRAY<INT>,
    type                 STRING,
    call_type            STRING,
    error                STRING,
    `from`               BINARY,
    `to`                 BINARY,
    gas                  BIGINT,
    gas_used             BIGINT,
    value                DECIMAL(38,0),
    input                BINARY,
    output               BINARY,
    month                STRING
)
USING PARQUET
PARTITIONED BY (month)
LOCATION '{{.TARGET_PATH}}'
