-- export the batch's day range into daily partitions; INSERT OVERWRITE +
-- dynamic partition mode makes a replayed range replace exactly its own
-- days (idempotent range-keyed write, SURVEY.md §7.2; reference:
-- examples/table_to_daily_parquet_file/transform.sql:1-12)
INSERT OVERWRITE TABLE {{.SINK_TABLE}} PARTITION (date)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority,
       to_date(o_orderdate) AS date
FROM source
WHERE o_orderdate >= CAST(date_add(DATE '1970-01-01', {{.START}}) AS TIMESTAMP)
  AND o_orderdate <  CAST(date_add(DATE '1970-01-01', {{.END}} + 1) AS TIMESTAMP)
