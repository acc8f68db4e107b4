-- daily-partitioned parquet sink table (analog of the s3(...{_partition_id}...)
-- write target, reference: examples/table_to_daily_parquet_file/transform.sql:1-8)
CREATE TABLE IF NOT EXISTS {{.SINK_TABLE}} (
    o_orderkey      BIGINT,
    o_custkey       BIGINT,
    o_orderstatus   STRING,
    o_totalprice    DOUBLE,
    o_orderdate     TIMESTAMP,
    o_orderpriority STRING,
    date            DATE
)
USING PARQUET
PARTITIONED BY (date)
LOCATION '{{.TARGET_PATH}}'
