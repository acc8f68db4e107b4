-- newest complete day in the source (max day - 1, mirroring
-- examples/table_to_daily_parquet_file/tip.sql:1-3)
SELECT CAST(datediff(to_date(max(o_orderdate)), DATE '1970-01-01') AS BIGINT) - 1
    AS tip
FROM source
