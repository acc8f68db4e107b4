-- month-partitioned blocks sink (analog of the ReplacingMergeTree table
-- PARTITION BY toYYYYMM(timestamp) ORDER BY number, reference:
-- examples/ethereum_blocks/create_table.sql:1-50). Replays append; the
-- read path dedups by (number) via sources.replacing.read_replacing.
CREATE TABLE IF NOT EXISTS {{.SINK_TABLE}} (
    timestamp        TIMESTAMP,
    number           BIGINT,
    hash             BINARY,
    parent_hash      BINARY,
    miner            BINARY,
    gas_limit        BIGINT,
    gas_used         BIGINT,
    base_fee_per_gas DECIMAL(38,0),
    size             INT,
    extra_data       BINARY,
    month            STRING
)
USING PARQUET
PARTITIONED BY (month)
LOCATION '{{.TARGET_PATH}}'
