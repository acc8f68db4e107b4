SELECT CASE WHEN count(*) = 0 THEN NULL
            ELSE CAST(datediff(max(date), DATE '1970-01-01') + 1 AS BIGINT)
       END AS start
FROM {{.SINK_TABLE}}
