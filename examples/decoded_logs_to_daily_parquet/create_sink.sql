-- daily-partitioned decoded-log export target (reference:
-- examples/decoded_logs_to_daily_parquet_file/transform.sql:1-8)
CREATE TABLE IF NOT EXISTS {{.SINK_TABLE}} (
    timestamp        TIMESTAMP,
    block_number     BIGINT,
    transaction_hash BINARY,
    log_index        INT,
    address          BINARY,
    signature        STRING,
    inputs           STRING,
    date             DATE
)
USING PARQUET
PARTITIONED BY (date)
LOCATION '{{.TARGET_PATH}}'
