-- resume after the last exported day; NULL when the sink is empty
-- (reference: examples/table_to_daily_parquet_file/start.sql:1-14)
SELECT CASE WHEN count(*) = 0 THEN NULL
            ELSE CAST(datediff(max(date), DATE '1970-01-01') + 1 AS BIGINT)
       END AS start
FROM {{.SINK_TABLE}}
