-- chunk sink: one row per training chunk, keyed for replay dedup
CREATE TABLE IF NOT EXISTS {{.SINK_TABLE}} (
    doc_id      BIGINT,
    chunk_id    INT,
    chunk_text  STRING,
    n_tokens    BIGINT,
    content_md5 STRING,
    lang        STRING,
    source      STRING,
    split       STRING
)
USING PARQUET
LOCATION '{{.TARGET_PATH}}'
