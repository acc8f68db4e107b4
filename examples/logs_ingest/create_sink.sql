-- logs sink (reference: examples/ethereum_logs/create_table.sql:1-21)
CREATE TABLE IF NOT EXISTS {{.SINK_TABLE}} (
    timestamp          TIMESTAMP,
    block_hash         BINARY,
    block_number       BIGINT,
    transaction_from   BINARY,
    transaction_status TINYINT,
    transaction_hash   BINARY,
    transaction_index  INT,
    removed            BOOLEAN,
    log_index          INT,
    address            BINARY,
    data               BINARY,
    topics             ARRAY<BINARY>,
    month              STRING
)
USING PARQUET
PARTITIONED BY (month)
LOCATION '{{.TARGET_PATH}}'
