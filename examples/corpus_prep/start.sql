SELECT max(doc_id) + 1 AS start FROM {{.SINK_TABLE}}
