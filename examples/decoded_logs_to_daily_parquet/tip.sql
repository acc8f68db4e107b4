SELECT CAST(datediff(to_date(max(timestamp)), DATE '1970-01-01') AS BIGINT)
    AS tip
FROM {{.SOURCE_TABLE}}
