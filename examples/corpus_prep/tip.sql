SELECT max(doc_id) AS tip FROM corpus_source
