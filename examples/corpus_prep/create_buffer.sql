-- per-batch corpus prep: PII scrub (operators/pii.py patterns, applied
-- in the same fixed order; content_md5 keys dedup on the ORIGINAL text
-- so a redaction-rule change can never resurrect duplicates) → quality
-- gate → stratified sample + split assignment (salted-hash: a pure
-- function of doc_id, so batch boundaries and replays can never change
-- membership) → within-batch exact-dedup (keep the lowest doc_id per
-- content hash; the content_md5 column keys global dedup at read) →
-- 32/8 token-window chunking
CREATE OR REPLACE TEMPORARY VIEW buffer_{{.START}}_{{.END}} AS
WITH redacted AS (
    SELECT doc_id, lang, source,
           md5(CAST(text AS BINARY))                        AS content_md5,
           regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>'),
               '\\+?\\d[\\d() -]{7,}\\d', '<PHONE>')        AS text
    FROM corpus_source
    WHERE doc_id >= {{.START}} AND doc_id <= {{.END}}
),
scoped AS (
    SELECT doc_id, text, lang, source, content_md5,
           size(split(trim(text), '\\s+'))                  AS n_words,
           size(regexp_extract_all(text, '[^A-Za-z0-9\\s]', 0)) AS n_punct
    FROM redacted
),
quality AS (
    SELECT * FROM scoped
    WHERE n_words BETWEEN 10 AND 100000
      AND CAST(n_punct AS DOUBLE) / greatest(length(text), 1) < 0.1
),
sampled AS (
    SELECT *,
           CASE WHEN split_bucket < 8 THEN 'train'
                WHEN split_bucket = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT *,
               CAST(conv(substring(md5(CAST(concat('sample:', CAST(doc_id AS STRING)) AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 100 AS sample_bucket,
               CAST(conv(substring(md5(CAST(concat('split:',  CAST(doc_id AS STRING)) AS BINARY)), 1, 15), 16, 10) AS BIGINT) % 10  AS split_bucket
        FROM quality)
    WHERE sample_bucket < CASE lang WHEN 'en' THEN 60 WHEN 'es' THEN 45
                                    WHEN 'de' THEN 45 WHEN 'fr' THEN 25
                                    ELSE 0 END
),
deduped AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY content_md5
                                     ORDER BY doc_id) AS rn
        FROM sampled) WHERE rn = 1
),
words_t AS (
    SELECT doc_id, content_md5, lang, source, split,
           split(lower(trim(text)), '\\s+') AS words
    FROM deduped
),
chunked AS (
    SELECT doc_id, content_md5, lang, source, split, words,
           posexplode(sequence(0, CAST(floor((size(words) - 1) / 24) AS INT)))
               AS (pos, chunk_id)
    FROM words_t
)
SELECT doc_id,
       CAST(chunk_id AS INT)                                   AS chunk_id,
       array_join(slice(words, 1 + chunk_id * 24, 32), ' ')    AS chunk_text,
       CAST(least(chunk_id * 24 + 32, size(words))
            - chunk_id * 24 AS BIGINT)                         AS n_tokens,
       content_md5, lang, source, split
FROM chunked
WHERE chunk_id * 24 < size(words)
