"""DuckDB-runnable ANSI-SQL oracles for every query in queries.py.

Column aliases match the Spark side exactly (driver hash-compares values
after sorting columns by name). Types are aligned too: Spark counts/lengths
are cast to bigint because DuckDB's count/len/length return BIGINT.
"""

ORACLES: dict[str, str] = {
    "cdc_lww_dedup": """
        SELECT user_id AS key_id,
               event_id AS winner_event_id,
               epoch_ms(ts) AS cursor_ms,
               event_type AS winner_type,
               value AS winner_value
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    "cdc_final_state": """
        SELECT user_id AS key_id,
               event_id AS winner_event_id,
               event_type AS winner_type,
               value AS winner_value,
               sha256(props) AS props_sha
        FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1 AND event_type <> 'error'
    """,
    "cdc_op_routing": """
        SELECT CASE WHEN event_type = 'signup' THEN 'i'
                    WHEN event_type = 'error' THEN 'd'
                    ELSE 'u' END AS op,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_keys
        FROM events
        GROUP BY 1
    """,
    "cdc_batch_lineage": """
        SELECT (user_id % 8) AS bucket,
               count(*) AS n_events,
               min(epoch_ms(ts)) AS min_cursor_ms,
               max(epoch_ms(ts)) AS max_cursor_ms,
               min(event_id) AS min_offset,
               max(event_id) AS max_offset
        FROM events
        GROUP BY 1
    """,
    "cdc_conflicts": """
        SELECT user_id AS key_id,
               count(*) AS n_events,
               count(*) - 1 AS n_conflicts
        FROM events
        GROUP BY 1
    """,
    "cdc_table_fingerprint": """
        WITH final AS (
          SELECT user_id AS key_id,
                 event_id AS winner_event_id,
                 event_type AS winner_type,
                 sha256(props) AS props_sha
          FROM (
            SELECT *, row_number() OVER (
                     PARTITION BY user_id
                     ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
            FROM events
          ) WHERE rn = 1 AND event_type <> 'error'
        )
        SELECT count(*) AS n_rows,
               bit_xor(('0x' || substr(sha256(
                   key_id::VARCHAR || '|' || winner_event_id::VARCHAR || '|'
                   || winner_type || '|' || props_sha), 1, 15))::BIGINT)
                 AS table_digest
        FROM final
    """,
    "content_normalize_sha": """
        SELECT doc_id,
               length(norm) AS norm_len,
               sha256(norm) AS content_sha
        FROM (
          SELECT doc_id,
                 regexp_replace(regexp_replace(regexp_replace(
                     text, '\\r\\n?', chr(10), 'g'),
                     '[ \\t]+\\n', chr(10), 'g'),
                     '[ \\t]+$', '') AS norm
          FROM documents
        )
    """,
    "redact_columns": """
        SELECT c_custkey,
               'XXXXX' AS c_name,
               'XXXXX' AS c_address,
               c_nationkey,
               c_acctbal
        FROM customer
    """,
    "text_token_count": """
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               length(text) AS n_chars_actual,
               len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                 AS n_distinct_tokens
        FROM documents
        WHERE length(text) > 0
    """,
    "text_quality_score": """
        WITH t AS (
          SELECT doc_id, text,
                 regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents WHERE length(text) > 0
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_filter(toks,
                   x -> x IN ('the','a','of','and','to','in'))) AS n_stopwords,
               len(list_filter(toks,
                   x -> x IN ('the','a','of','and','to','in')))::DOUBLE
                 / len(toks)::DOUBLE AS stopword_ratio,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::DOUBLE
                 / length(text)::DOUBLE AS alpha_ratio
        FROM t
    """,
    "text_langid": """
        WITH t AS (
          SELECT doc_id, lang,
                 regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents WHERE length(text) > 0
        )
        SELECT doc_id,
               lang AS labeled_lang,
               CASE WHEN len(list_filter(toks,
                        x -> x IN ('the','a','of','and','to','in','is','it'))) * 100
                        >= len(toks) * 2
                    THEN 'en' ELSE 'und' END AS predicted_lang
        FROM t
    """,
    "dedup_exact": """
        SELECT sha256(regexp_replace(regexp_replace(regexp_replace(
                   text, '\\r\\n?', chr(10), 'g'),
                   '[ \\t]+\\n', chr(10), 'g'),
                   '[ \\t]+$', '')) AS content_sha,
               min(doc_id) AS keeper_doc_id,
               count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
}
