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


# --------------------------------------------------------------------------
# Generated oracles for the training-data operators. The constructions
# mirror airbyte_module_spark/operators/{text,dedup,similarity}.py exactly:
# same sha256-prefix 60-bit hash, same shingling (1-based indexing), same
# integer quantization — so values are bit-identical across engines.

def _h64(expr: str) -> str:
    return f"('0x' || substr(sha256({expr}), 1, 15))::BIGINT"


_TOKS = "regexp_split_to_array(trim(text), '\\s+')"

# word 3-gram shingles, distinct (mirrors operators.text.word_shingles n=3)
_SHINGLES3 = (
    "list_distinct(list_transform(range(1, len(t) - 1), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)
_SHINGLES3_CTE = f"""
  toks AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE length(text) > 0),
  sh AS (SELECT doc_id, {_SHINGLES3} AS s FROM toks WHERE len(t) >= 3)
"""

ORACLES["doc_fingerprint"] = f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform({_TOKS}, tok -> {_h64('tok')} % 2147483647)),
             (a, b) -> (a * 131 + b) % 2147483647) AS fingerprint,
           len({_TOKS}) AS n_tokens
    FROM documents WHERE length(text) > 0
"""

def _min_exprs() -> str:
    # mirrors operators.dedup.with_minhash: one 32-bit base hash per shingle
    # (first 8 hex chars of sha256), then the universal hash family
    # m_j = min over shingles of (a_j * base + b_j) mod p — identical
    # coefficients imported from the operator module, exact int64 math
    from airbyte_module_spark.operators.dedup import MINHASH_PRIME, minhash_coeffs

    base = "('0x' || substr(sha256(x), 1, 8))::BIGINT"
    parts = []
    for j, (a, b) in enumerate(minhash_coeffs()):
        expr = f"({a} * {base} + {b}) % {MINHASH_PRIME}"
        parts.append(f"list_min(list_transform(s, x -> {expr})) AS m{j}")
    return ", ".join(parts)


_MINS = _min_exprs()

ORACLES["dedup_minhash"] = f"""
    WITH {_SHINGLES3_CTE},
    sig AS (SELECT doc_id, {_MINS} FROM sh)
    SELECT doc_id,
           concat_ws(',', {', '.join(f'm{j}::VARCHAR' for j in range(16))})
             AS signature
    FROM sig
"""

_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, sha256("
    + " || ',' || ".join(f"m{b * 4 + r}::VARCHAR" for r in range(4))
    + ") AS band_hash FROM sig"
    for b in range(4)
)

ORACLES["dedup_minhash_lsh"] = f"""
    WITH {_SHINGLES3_CTE},
    sig AS (SELECT doc_id, {_MINS} FROM sh),
    bands AS ({_BANDS})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    GROUP BY 1, 2
"""

_SIM_SUMS = ", ".join(
    f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(32)
)
_SIM_BITS = " + ".join(
    f"CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END" for b in range(32)
)

ORACLES["dedup_simhash"] = f"""
    WITH ex AS (
      SELECT doc_id, {_h64('tok')} AS h
      FROM (SELECT doc_id,
                   unnest(list_distinct({_TOKS})) AS tok
            FROM documents WHERE length(text) > 0)
    ),
    g AS (SELECT doc_id, {_SIM_SUMS} FROM ex GROUP BY doc_id)
    SELECT doc_id, ({_SIM_BITS})::BIGINT AS simhash FROM g
"""

ORACLES["dedup_ngram_jaccard"] = f"""
    WITH {_SHINGLES3_CTE},
    sizes AS (SELECT doc_id, len(s) AS n_sh FROM sh WHERE len(s) > 0),
    ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.sg = b.sg AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common)::DOUBLE AS jaccard
    FROM common
    JOIN sizes sa ON common.doc_a = sa.doc_id
    JOIN sizes sb ON common.doc_b = sb.doc_id
    WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common)::DOUBLE >= 0.15
"""

_QUANT_CTE = """
  q AS (SELECT vec_id,
               list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT)
                 AS qv
        FROM embeddings),
  n AS (SELECT vec_id, qv,
               list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i]))::BIGINT
                 AS norm2
        FROM q)
"""
_DOT_AB = "list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i]))::BIGINT"

# mirrors operators.similarity.near_dup_pairs' max_rows guard: above
# MAX_VERIFIER_ROWS vectors both engines subsample vec_id % ceil(n/cap) == 0
# (a no-op modulus of 1 at the driver's sf)
_VERIFIER_SAMPLED_QUANT_CTE = """
  samp AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id % (SELECT CAST(greatest(1, ceil(count(*) / 20000.0))
                                       AS BIGINT)
                           FROM embeddings) = 0),
  q AS (SELECT vec_id,
               list_transform(embedding, x -> round(x::DOUBLE * 1000)::BIGINT)
                 AS qv
        FROM samp),
  n AS (SELECT vec_id, qv,
               list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i]))::BIGINT
                 AS norm2
        FROM q)
"""

ORACLES["embedding_near_dup"] = f"""
    WITH {_VERIFIER_SAMPLED_QUANT_CTE},
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {_DOT_AB} AS dot_q,
             a.norm2 AS na, b.norm2 AS nb
      FROM n a JOIN n b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, dot_q,
           dot_q::DOUBLE / sqrt((na * nb)::DOUBLE) AS cosine
    FROM pairs
    WHERE dot_q::DOUBLE / sqrt((na * nb)::DOUBLE) >= 0.45
"""

ORACLES["ann_topk"] = f"""
    WITH {_QUANT_CTE},
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DOT_AB} AS dot_q,
             ({_DOT_AB})::DOUBLE / sqrt((a.norm2 * b.norm2)::DOUBLE) AS cosine
      FROM n a JOIN n b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < 10
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, dot_q, cosine
    FROM ranked WHERE rank <= 5
"""


def _plane_bits_sql() -> str:
    from airbyte_module_spark.operators.similarity import plane_coeffs

    bits = []
    for p, coeffs in enumerate(plane_coeffs()):
        lit = "[" + ", ".join(f"{c}::BIGINT" for c in coeffs) + "]"
        bits.append(
            f"CASE WHEN list_sum(list_transform(range(1, 65), "
            f"i -> qv[i] * ({lit})[i])) >= 0 THEN {1 << p} ELSE 0 END"
        )
    return " + ".join(bits)


ORACLES["ann_lsh_buckets"] = f"""
    WITH q AS (SELECT vec_id,
                      list_transform(embedding,
                                     x -> round(x::DOUBLE * 1000)::BIGINT) AS qv
               FROM embeddings)
    SELECT vec_id, ({_plane_bits_sql()})::BIGINT AS bucket FROM q
"""

_NB_CTE = f"""
    bk AS (SELECT vec_id, ({{planes}})::BIGINT AS bucket
           FROM (SELECT vec_id, qv FROM q) _t),
    nb AS (SELECT n.vec_id, n.qv, n.norm2, bk.bucket
           FROM n JOIN bk ON n.vec_id = bk.vec_id)
"""

ORACLES["ann_topk_lsh"] = f"""
    WITH {_QUANT_CTE},
    {_NB_CTE.format(planes=_plane_bits_sql())},
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_DOT_AB} AS dot_q,
             ({_DOT_AB})::DOUBLE / sqrt((a.norm2 * b.norm2)::DOUBLE) AS cosine
      FROM nb a JOIN nb b
        ON b.bucket = a.bucket AND b.vec_id <> a.vec_id
      WHERE a.vec_id < 10
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, dot_q, cosine
    FROM ranked WHERE rank <= 5
"""

_PROBE_LIST = "[bucket, " + ", ".join(f"xor(bucket, {1 << p})" for p in range(8)) + "]"

ORACLES["ann_topk_multiprobe"] = f"""
    WITH {_QUANT_CTE},
    {_NB_CTE.format(planes=_plane_bits_sql())},
    probes AS (
      SELECT vec_id AS query_id, qv AS q_qv, norm2 AS q_norm2,
             unnest({_PROBE_LIST}) AS pbucket
      FROM nb WHERE vec_id < 10
    ),
    scored AS (
      SELECT a.query_id, b.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 65),
                 i -> a.q_qv[i] * b.qv[i]))::BIGINT AS dot_q,
             list_sum(list_transform(range(1, 65),
                 i -> a.q_qv[i] * b.qv[i]))::DOUBLE
               / sqrt((a.q_norm2 * b.norm2)::DOUBLE) AS cosine
      FROM probes a JOIN nb b
        ON b.bucket = a.pbucket AND b.vec_id <> a.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, dot_q, cosine
    FROM ranked WHERE rank <= 5
"""

def _ivf_train_cte(iters: int = 2, max_train_rows: int = 4096) -> str:
    """Trained-quantizer CTE chain mirroring
    operators.similarity._train_centroids_np bit-for-bit: modulus-capped
    sample, first-``64`` lowest-vec_id seeds, ``iters`` Lloyd steps with
    argmax-cosine assignment (first-max = lowest-cell tiebreak via
    row_number) and element-wise floor-mean centroid updates in exact int64
    (floor(sum/cnt) through double division is exact: |sum| < 2^53 and the
    true quotient sits >= 1/cnt away from any integer it could round
    across). Empty cells and zero-norm means keep the previous centroid."""
    parts = [
        f"""samp AS (SELECT vec_id, qv, norm2 FROM n
             WHERE norm2 > 0 AND vec_id % (
               SELECT CAST(greatest(1, ceil(count(*) / {max_train_rows}.0))
                           AS BIGINT)
               FROM embeddings) = 0),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                  qv AS cv, norm2 AS cn
           FROM samp QUALIFY row_number() OVER (ORDER BY vec_id) <= 64)"""
    ]
    for j in range(iters):
        parts.append(
            f"""a{j} AS (SELECT vec_id, qv, cell FROM (
        SELECT s.vec_id, s.qv, c.cell,
               row_number() OVER (PARTITION BY s.vec_id ORDER BY
                 (list_sum(list_transform(range(1, 65),
                      i -> s.qv[i] * c.cv[i]))::DOUBLE
                   / sqrt((s.norm2 * c.cn)::DOUBLE)) DESC, c.cell) AS rn
        FROM samp s, c{j} c) WHERE rn = 1),
    g{j} AS (SELECT cell, list(qv) AS vs, count(*) AS cnt
             FROM a{j} GROUP BY cell),
    u{j} AS (SELECT cell,
                    list_transform(range(1, 65), i ->
                      CAST(floor(list_sum(list_transform(vs, v -> v[i]))::DOUBLE
                                 / cnt) AS BIGINT)) AS mv
             FROM g{j}),
    un{j} AS (SELECT cell, mv,
                     list_sum(list_transform(range(1, 65),
                         i -> mv[i] * mv[i]))::BIGINT AS mn
              FROM u{j}),
    c{j + 1} AS (SELECT c.cell,
                      CASE WHEN un.mn IS NULL OR un.mn = 0
                           THEN c.cv ELSE un.mv END AS cv,
                      CASE WHEN un.mn IS NULL OR un.mn = 0
                           THEN c.cn ELSE un.mn END AS cn
               FROM c{j} c LEFT JOIN un{j} un ON un.cell = c.cell)"""
        )
    parts.append(f"cents AS (SELECT cell, cv, cn FROM c{iters})")
    return ",\n    ".join(parts)


_IVF_CTE = f"""
    {_ivf_train_cte()},
    simall AS (
      SELECT n.vec_id, n.qv, n.norm2, c.cell,
             list_sum(list_transform(range(1, 65),
                 i -> n.qv[i] * c.cv[i]))::DOUBLE
               / sqrt((n.norm2 * c.cn)::DOUBLE) AS s
      FROM n, cents c
    ),
    assigned AS (
      SELECT vec_id, qv, norm2, cell FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
        FROM simall
      ) WHERE rn = 1
    )
"""

ORACLES["ann_ivf_cells"] = f"""
    WITH {_QUANT_CTE},
    {_IVF_CTE}
    SELECT vec_id, cell FROM assigned
"""

ORACLES["ann_topk_ivf"] = f"""
    WITH {_QUANT_CTE},
    {_IVF_CTE},
    probes AS (
      SELECT vec_id AS query_id, qv AS q_qv, norm2 AS q_norm2, cell FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY vec_id ORDER BY s DESC, cell) AS pr
        FROM simall WHERE vec_id < 10
      ) WHERE pr <= 8
    ),
    scored AS (
      SELECT a.query_id, b.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 65),
                 i -> a.q_qv[i] * b.qv[i]))::BIGINT AS dot_q,
             list_sum(list_transform(range(1, 65),
                 i -> a.q_qv[i] * b.qv[i]))::DOUBLE
               / sqrt((a.q_norm2 * b.norm2)::DOUBLE) AS cosine
      FROM probes a JOIN assigned b
        ON b.cell = a.cell AND b.vec_id <> a.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, dot_q, cosine
    FROM ranked WHERE rank <= 5
"""


def _band_bucket_sqls(n_bands: int = 4, rows_per_band: int = 4) -> list[str]:
    """Mirror of operators.similarity.banded_buckets: per-band FULL-WIDTH
    (NEARDUP_R_MAX-bit) SRP code from the same deterministic hyperplanes,
    plane stride = NEARDUP_R_MAX. The adaptive r-bit bucket is the low-r-bit
    truncation of this code (``code % (1 << r)``), so ONE static expression
    mirrors every corpus-size-dependent width the Spark side can choose."""
    from airbyte_module_spark.operators.similarity import (
        NEARDUP_R_MAX,
        plane_coeffs,
    )

    planes = plane_coeffs(n_bands * NEARDUP_R_MAX)
    exprs = []
    for b in range(n_bands):
        bits = []
        for r in range(rows_per_band):
            lit = "[" + ", ".join(f"{c}::BIGINT" for c in planes[b * NEARDUP_R_MAX + r]) + "]"
            bits.append(
                f"CASE WHEN list_sum(list_transform(range(1, 65), "
                f"i -> qv[i] * ({lit})[i])) >= 0 THEN {1 << r} ELSE 0 END"
            )
        exprs.append("(" + " + ".join(bits) + ")::BIGINT")
    return exprs


def _neardup_modulus_sql() -> str:
    """Mirror of operators.similarity.adaptive_rows_per_band as a bucket
    MODULUS (1 << r): the smallest r in {4, 8, 12, 16} keeping expected
    bucket load <= NEARDUP_TARGET_BUCKET. Integer comparisons on count(*)
    of the RAW embeddings table (the Spark side counts the input DataFrame
    before the null/zero-norm filter), so both engines derive the identical
    width with no float-log edge cases."""
    from airbyte_module_spark.operators.similarity import NEARDUP_TARGET_BUCKET

    cases = " ".join(
        f"WHEN count(*) <= {NEARDUP_TARGET_BUCKET << r} THEN {1 << r}"
        for r in (4, 8, 12)
    )
    return f"SELECT CASE {cases} ELSE {1 << 16} END AS modulus FROM embeddings"


def _neardup_rmax():
    from airbyte_module_spark.operators.similarity import NEARDUP_R_MAX

    return NEARDUP_R_MAX


_C0, _C1, _C2, _C3 = _band_bucket_sqls(rows_per_band=_neardup_rmax())

ORACLES["embedding_near_dup_lsh"] = f"""
    WITH {_QUANT_CTE},
    m AS ({_neardup_modulus_sql()}),
    bb AS (
      SELECT vec_id, qv, norm2,
             {_C0} % modulus AS b0, {_C1} % modulus AS b1,
             {_C2} % modulus AS b2, {_C3} % modulus AS b3
      FROM n, m
    ),
    cand AS (
      -- one hash-equi join per band + DISTINCT across bands: identical
      -- pair set to the OR-join form, but each branch hash-joins on its
      -- bucket (the OR form forces a nested loop over all N^2/2 pairs,
      -- infeasible at sf1) — and the same candidate shape the Spark plan
      -- uses (band-bucket equi join, pair dedup by groupBy).
      SELECT DISTINCT vec_a, vec_b FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM bb a JOIN bb b ON a.b0 = b.b0 AND a.vec_id < b.vec_id
        UNION ALL
        SELECT a.vec_id, b.vec_id
          FROM bb a JOIN bb b ON a.b1 = b.b1 AND a.vec_id < b.vec_id
        UNION ALL
        SELECT a.vec_id, b.vec_id
          FROM bb a JOIN bb b ON a.b2 = b.b2 AND a.vec_id < b.vec_id
        UNION ALL
        SELECT a.vec_id, b.vec_id
          FROM bb a JOIN bb b ON a.b3 = b.b3 AND a.vec_id < b.vec_id
      )
    ),
    pairs AS (
      SELECT c.vec_a, c.vec_b,
             list_sum(list_transform(range(1, 65),
                 i -> x.qv[i] * y.qv[i]))::BIGINT AS dot_q,
             x.norm2 AS na, y.norm2 AS nb2
      FROM cand c
      JOIN n x ON x.vec_id = c.vec_a
      JOIN n y ON y.vec_id = c.vec_b
    )
    SELECT vec_a, vec_b, dot_q,
           dot_q::DOUBLE / sqrt((na * nb2)::DOUBLE) AS cosine
    FROM pairs
    WHERE dot_q::DOUBLE / sqrt((na * nb2)::DOUBLE) >= 0.45
"""

ORACLES["multimodal_meta"] = """
    SELECT doc_id,
           ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS kind,
           octet_length(encode(text))::BIGINT AS size_bytes,
           (doc_id % 64 + 1)::BIGINT AS width,
           (doc_id % 48 + 1)::BIGINT AS height,
           sha256(text) AS payload_sha
    FROM documents
"""

ORACLES["envelope_parse"] = """
    SELECT event_id AS seq,
           CASE WHEN event_type = 'signup' THEN 'i'
                WHEN event_type = 'error' THEN 'd'
                ELSE 'u' END AS op,
           'org' || (user_id % 5)::VARCHAR || '/project'
                 || (user_id % 23)::VARCHAR AS repo,
           'src/file_' || user_id::VARCHAR || '.py' AS path,
           substr(sha256(event_id::VARCHAR), 1, 40) AS commit,
           event_type AS lang,
           epoch_ms(ts) AS emitted_at,
           CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content
    FROM events
"""

ORACLES["merge_routing"] = """
    WITH w AS (
      SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC)
               AS rn
      FROM events WHERE event_id % 2 = 0
    ),
    target AS (SELECT user_id AS key_id, event_id AS tgt_event_id
               FROM w WHERE rn = 1),
    ws AS (
      SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC)
               AS rn
      FROM events WHERE event_id % 2 = 1
    ),
    source AS (SELECT user_id AS key_id, event_id AS src_event_id,
                      event_type AS src_type
               FROM ws WHERE rn = 1)
    SELECT s.key_id, s.src_event_id, t.tgt_event_id,
           CASE WHEN t.tgt_event_id IS NOT NULL AND s.src_type = 'error'
                  THEN 'delete'
                WHEN t.tgt_event_id IS NOT NULL THEN 'update'
                WHEN s.src_type <> 'error' THEN 'insert'
                ELSE 'skip' END AS action
    FROM source s LEFT JOIN target t ON s.key_id = t.key_id
"""

ORACLES["salted_join"] = """
    SELECT c_mktsegment,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           min(event_id) AS min_event_id,
           max(event_id) AS max_event_id
    FROM events e JOIN customer c ON (e.user_id % 1500) = c.c_custkey
    GROUP BY 1
"""

ORACLES["file_roundtrip_csv"] = """
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
"""

ORACLES["schema_discovery"] = """
    SELECT table_name, column_name, data_type,
           ordinal_position::BIGINT AS ordinal
    FROM information_schema.columns
    WHERE table_name IN ('region','nation','customer','supplier','part',
                         'orders','lineitem','events','documents','embeddings')
"""
