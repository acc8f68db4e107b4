-- register the source table (analog of the remote()/s3() source proxy,
-- reference: examples/table_to_daily_parquet_file/transform.sql:10)
CREATE OR REPLACE TEMPORARY VIEW source AS
SELECT * FROM parquet.`{{.SOURCE_PATH}}`
