-- replace-one-column export (reference transform.sql:11-16:
-- ``SELECT t.* EXCEPT (inputs), toJSONString(inputs) AS inputs`` — our
-- decoded sink already stores inputs as JSON text, so the replace is the
-- identity projection made explicit) into idempotent daily partitions
INSERT OVERWRITE TABLE {{.SINK_TABLE}} PARTITION (date)
SELECT timestamp, block_number, transaction_hash, log_index, address,
       signature,
       inputs,        -- already JSON text (the sink schema's String form)
       to_date(timestamp) AS date
FROM {{.SOURCE_TABLE}}
WHERE timestamp >= CAST(date_add(DATE '1970-01-01', {{.START}}) AS TIMESTAMP)
  AND timestamp <  CAST(date_add(DATE '1970-01-01', {{.END}} + 1) AS TIMESTAMP)
