"""DuckDB oracle SQL for the training-data pipeline operators (dedup,
similarity search) — mirrors operators/dedup.py and operators/similarity.py
expression-for-expression so the driver's Spark-vs-DuckDB hash compare is
meaningful.  Every hash used is md5-hex-prefix based precisely so both
engines can compute it identically."""

from __future__ import annotations

from searchenginepp_spark.functions.normalizer import SQL_PUNCT_CLASS
from searchenginepp_spark.operators.dedup import (
    LSH_BANDS, MINHASH_PRIME, NUM_PERM, SIMHASH_BITS, minhash_coeffs,
)
from searchenginepp_spark.operators.similarity import plane_signs

_PUNCT_SQL = SQL_PUNCT_CLASS.replace("'", "''")


def cte_raw_tokens(src: str = "documents") -> str:
    """Ordered, non-empty, lowercase tokens (dedup sees the doc verbatim —
    no stopword/stem, unlike the index tokenizer)."""
    return f"""
  dtoks AS (
    SELECT doc_id AS docid,
           list_filter(string_split_regex(
             lower(regexp_replace(text, '{_PUNCT_SQL}', ' ', 'g')),
             '\\s+'), t -> t <> '') AS tk
    FROM {src}
  )"""


def cte_shingles(n: int = 3) -> str:
    return f"""
  dsh AS (
    SELECT DISTINCT docid, array_to_string(tk[i:i+{n - 1}], ' ') AS shingle
    FROM dtoks, UNNEST(generate_series(1, greatest(len(tk) - {n - 1}, 0))) AS g(i)
  )"""


def sql_dedup_exact() -> str:
    return """
SELECT md5(text) AS content_md5,
       COUNT(*)::BIGINT AS n_dups,
       MIN(doc_id)::BIGINT AS canonical_docid
FROM documents GROUP BY 1"""


def sql_ngram_jaccard(n: int = 3, threshold: float = 0.5,
                      max_shingle_df: int | None = 256) -> str:
    cap = ""
    src = "dsh"
    if max_shingle_df is not None:
        src = "dshc"
        cap = f""",
  rare AS (
    SELECT shingle FROM dsh GROUP BY shingle
    HAVING COUNT(*) <= {max_shingle_df}
  ),
  dshc AS (SELECT dsh.docid, dsh.shingle FROM dsh JOIN rare USING (shingle))"""
    return f"""
WITH {cte_raw_tokens()}, {cte_shingles(n)}{cap},
  sz AS (SELECT docid, COUNT(*) AS sz FROM {src} GROUP BY docid),
  inter AS (
    SELECT a.docid AS docid_a, b.docid AS docid_b, COUNT(*) AS i
    FROM {src} a JOIN {src} b ON a.shingle = b.shingle AND a.docid < b.docid
    GROUP BY 1, 2
  ),
  j AS (
    SELECT docid_a, docid_b,
           ROUND(i * 1.0 / (x.sz + y.sz - i), 6) AS jaccard
    FROM inter JOIN sz x ON x.docid = docid_a JOIN sz y ON y.docid = docid_b
  )
SELECT docid_a, docid_b, jaccard FROM j WHERE jaccard >= {threshold}"""


def sql_minhash_lsh(n: int = 3, num_perm: int = NUM_PERM,
                    bands: int = LSH_BANDS) -> str:
    rows = num_perm // bands
    coeffs = minhash_coeffs(num_perm)
    mh_cols = ", ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_PRIME}) AS mh{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT docid, {bidx} AS band, md5("
        + " || ':' || ".join(f"mh{bidx * rows + r}::VARCHAR" for r in range(rows))
        + ") AS bucket FROM mh"
        for bidx in range(bands)
    )
    return f"""
WITH {cte_raw_tokens()}, {cte_shingles(n)},
  hashed AS (
    SELECT docid, ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS h FROM dsh
  ),
  mh AS (SELECT docid, {mh_cols} FROM hashed GROUP BY docid),
  buckets AS ({band_selects})
SELECT DISTINCT a.docid AS docid_a, b.docid AS docid_b
FROM buckets a JOIN buckets b
  ON a.band = b.band AND a.bucket = b.bucket AND a.docid < b.docid"""


def sql_simhash_pairs(max_hamming: int = 8, bits: int = SIMHASH_BITS) -> str:
    """Oracle keeps the simple 4-block (c=1) candidate scheme: both it and
    the Spark side's combinatorial C(n_blocks, n_blocks-h) tables are
    RECALL-COMPLETE for hamming ≤ max_hamming (pigeonhole), and the final
    SELECT filters candidates to exact distance ≤ max_hamming — so the two
    engines' result SETS are identical regardless of blocking (requires
    max_hamming ≤ 3 here for the 4-block pigeonhole to hold)."""
    block_sz = bits // 4
    mask = (1 << block_sz) - 1
    return f"""
WITH {cte_raw_tokens()},
  tfd AS (
    SELECT docid, t AS term, COUNT(*)::BIGINT AS tf
    FROM (SELECT docid, UNNEST(tk) AS t FROM dtoks) GROUP BY 1, 2
  ),
  th AS (
    SELECT docid, tf, ('0x' || substr(md5(term), 1, 15))::BIGINT AS h FROM tfd
  ),
  bitsum AS (
    SELECT docid, b, SUM(tf * (((h >> b) & 1) * 2 - 1)) AS s
    FROM th, UNNEST(generate_series(0, {bits - 1})) AS g(b) GROUP BY 1, 2
  ),
  sh AS (
    SELECT docid,
           SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
    FROM bitsum GROUP BY docid
  ),
  blocks AS (
    SELECT docid, simhash, blk, (simhash >> (blk * {block_sz})) & {mask} AS val
    FROM sh, UNNEST([0, 1, 2, 3]) AS q(blk)
  ),
  cand AS (
    SELECT DISTINCT a.docid AS docid_a, b.docid AS docid_b,
           a.simhash AS sa, b.simhash AS sb
    FROM blocks a JOIN blocks b
      ON a.blk = b.blk AND a.val = b.val AND a.docid < b.docid
  )
SELECT docid_a, docid_b, bit_count(xor(sa, sb))::BIGINT AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}"""


def _ids_in(ids: list[int]) -> str:
    return ", ".join(str(i) for i in ids)


def sql_cosine_topk(query_ids: list[int], k: int = 5) -> str:
    return f"""
WITH base AS (
    SELECT vec_id, embedding::DOUBLE[] AS e,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
    FROM embeddings
  ),
  q AS (
    SELECT vec_id AS query_id, e AS qe, norm AS qnorm FROM base
    WHERE vec_id IN ({_ids_in(query_ids)})
  ),
  scored AS (
    SELECT q.query_id, base.vec_id,
           ROUND(list_dot_product(base.e, q.qe) / (base.norm * q.qnorm), 6) AS cosine
    FROM base JOIN q ON base.vec_id <> q.query_id
  ),
  ranked AS (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id ASC) AS rank,
           cosine
    FROM scored
  )
SELECT query_id, vec_id, rank::BIGINT AS rank, cosine FROM ranked
WHERE rank <= {k}"""


def sql_ivf_ann_topk(query_ids: list[int], k: int = 5,
                     n_centroids: int = 16, n_probe: int = 4) -> str:
    """Mirrors operators/similarity.ivf_ann_topk expression-for-expression:
    md5-seeded deterministic centroids, rounded-cosine assignment with
    centroid_id tiebreak, n_probe nearest centroids per query, exact
    re-rank of assigned candidates."""
    return f"""
WITH base AS (
    SELECT vec_id, embedding::DOUBLE[] AS e,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
    FROM embeddings
  ),
  cents AS (
    SELECT ROW_NUMBER() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id)::BIGINT
             AS centroid_id,
           e AS ce, norm AS cnorm
    FROM base
    ORDER BY md5(vec_id::VARCHAR), vec_id
    LIMIT {n_centroids}
  ),
  assign AS (
    SELECT vec_id, centroid_id FROM (
      SELECT b.vec_id, c.centroid_id,
             ROW_NUMBER() OVER (
               PARTITION BY b.vec_id
               ORDER BY ROUND(list_dot_product(b.e, c.ce)
                              / (b.norm * c.cnorm), 6) DESC,
                        c.centroid_id ASC) AS r
      FROM base b CROSS JOIN cents c
    ) WHERE r = 1
  ),
  q AS (
    SELECT vec_id AS query_id, e AS qe, norm AS qnorm FROM base
    WHERE vec_id IN ({_ids_in(query_ids)})
  ),
  probes AS (
    SELECT query_id, centroid_id, qe, qnorm FROM (
      SELECT q.query_id, c.centroid_id, q.qe, q.qnorm,
             ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY ROUND(list_dot_product(q.qe, c.ce)
                              / (q.qnorm * c.cnorm), 6) DESC,
                        c.centroid_id ASC) AS r
      FROM q CROSS JOIN cents c
    ) WHERE r <= {n_probe}
  ),
  scored AS (
    SELECT p.query_id, b.vec_id,
           ROUND(list_dot_product(b.e, p.qe) / (b.norm * p.qnorm), 6) AS cosine
    FROM base b
    JOIN assign a ON a.vec_id = b.vec_id
    JOIN probes p ON p.centroid_id = a.centroid_id
    WHERE b.vec_id <> p.query_id
  ),
  ranked AS (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id ASC) AS rank,
           cosine
    FROM scored
  )
SELECT query_id, vec_id, rank::BIGINT AS rank, cosine FROM ranked
WHERE rank <= {k}"""


def _plane_array_sql(signs: list[int]) -> str:
    return "[" + ", ".join(f"{s:.1f}" for s in signs) + "]::DOUBLE[]"


def cte_lsh_buckets(dims: int, n_planes: int) -> str:
    """bucket = Σ_i (proj_i > 0) << i with the SAME deterministic ±1 planes
    as similarity.plane_signs, inlined as literals."""
    signs = plane_signs(n_planes, dims)
    bits = " + ".join(
        f"(CASE WHEN list_dot_product(e, {_plane_array_sql(row)}) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, row in enumerate(signs)
    )
    return f"""
  base AS (
    SELECT vec_id, embedding::DOUBLE[] AS e,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
    FROM embeddings
  ),
  bucketed AS (SELECT vec_id, e, norm, ({bits})::BIGINT AS bucket FROM base)"""


def sql_lsh_ann_topk(query_ids: list[int], dims: int, k: int = 5,
                     n_planes: int = 8) -> str:
    return f"""
WITH {cte_lsh_buckets(dims, n_planes)},
  q AS (
    SELECT vec_id AS query_id, e AS qe, norm AS qnorm, bucket AS qbucket
    FROM bucketed WHERE vec_id IN ({_ids_in(query_ids)})
  ),
  scored AS (
    SELECT q.query_id, c.vec_id,
           ROUND(list_dot_product(c.e, q.qe) / (c.norm * q.qnorm), 6) AS cosine
    FROM bucketed c JOIN q
      ON c.bucket = q.qbucket AND c.vec_id <> q.query_id
  ),
  ranked AS (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id ASC) AS rank,
           cosine
    FROM scored
  )
SELECT query_id, vec_id, rank::BIGINT AS rank, cosine FROM ranked
WHERE rank <= {k}"""


def sql_events_windowed() -> str:
    return """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""


def sql_daily_event_stats() -> str:
    return """
SELECT CAST(ts AS DATE) AS event_date, event_type,
       COUNT(*)::BIGINT AS n_events,
       ROUND(AVG(json_extract(props, '$.k')::BIGINT), 6) AS avg_k,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""


def sql_sessionize(gap_seconds: int = 28_800) -> str:
    return f"""
WITH marked AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN floor(epoch(ts))::BIGINT
                     - lag(floor(epoch(ts))::BIGINT)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > {gap_seconds}
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
  ),
  sess AS (
    SELECT user_id, event_id, ts, value,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
  )
SELECT user_id, session_id::BIGINT AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*)::BIGINT AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM sess GROUP BY user_id, session_id"""


def sql_byte_histogram(n_buckets: int = 16) -> str:
    """Histogram over the UTF-8 BYTES of the text (the Spark side histograms
    encode(content,'utf-8') bytes) — the blob is hex-encoded and read back
    two chars per byte, so multi-byte characters bucket identically to the
    engine's numpy kernel (ADVICE round 1: the earlier per-character ascii()
    form agreed only on pure-ASCII corpora)."""
    width = 256 // n_buckets
    return f"""
WITH h AS (
    SELECT doc_id AS asset_id, hex(encode(text)) AS hx FROM documents
  ),
  bytes AS (
    SELECT asset_id,
           ('0x' || substring(hx, 2 * i - 1, 2))::BIGINT // {width} AS bucket
    FROM h, UNNEST(generate_series(1, length(hx) // 2)) AS g(i)
  )
SELECT asset_id, bucket::BIGINT AS bucket, COUNT(*)::BIGINT AS count
FROM bytes GROUP BY 1, 2"""


# -------------------------------------------------- text analysis oracles

def sql_token_counts() -> str:
    from searchenginepp_spark.operators.text_analysis import BPE_REGEX

    return f"""
SELECT doc_id AS docid,
       length(text)::BIGINT AS n_chars,
       len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))::BIGINT
         AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_REGEX}'))::BIGINT AS n_bpe_tokens
FROM documents"""


def sql_quality_scores() -> str:
    from searchenginepp_spark.oracle_sql import stopword_in_list

    return f"""
WITH base AS (
    SELECT doc_id AS docid,
           length(text)::DOUBLE AS n_chars,
           (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))::DOUBLE
             AS n_alpha,
           (length(text) - length(regexp_replace(text, '{_PUNCT_SQL}', '', 'g')))::DOUBLE
             AS n_punct,
           list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
    FROM documents
  ),
  toks AS (SELECT docid, UNNEST(tk) AS tok FROM base),
  tagg AS (
    SELECT docid, COUNT(*)::BIGINT AS n_ws_tokens,
           SUM(CASE WHEN tok IN ({stopword_in_list()}) THEN 1 ELSE 0 END)::BIGINT
             AS n_stop,
           SUM(length(tok))::DOUBLE AS tok_chars
    FROM toks GROUP BY docid
  ),
  j AS (
    SELECT b.docid, b.n_chars, b.n_alpha, b.n_punct,
           COALESCE(t.n_ws_tokens, 0) AS n_ws_tokens,
           COALESCE(t.n_stop, 0) AS n_stop,
           COALESCE(t.tok_chars, 0.0) AS tok_chars
    FROM base b LEFT JOIN tagg t ON t.docid = b.docid
  ),
  r AS (
    SELECT docid, n_ws_tokens,
           ROUND(n_alpha / greatest(n_chars, 1.0), 6) AS alpha_ratio,
           ROUND(n_punct / greatest(n_chars, 1.0), 6) AS punct_ratio,
           ROUND(n_stop / greatest(n_ws_tokens::DOUBLE, 1.0), 6) AS stopword_ratio,
           ROUND(tok_chars / greatest(n_ws_tokens::DOUBLE, 1.0), 6) AS avg_token_len
    FROM j
  )
SELECT docid, n_ws_tokens, alpha_ratio, punct_ratio, stopword_ratio,
       avg_token_len,
       ROUND(0.4 * alpha_ratio + 0.3 * (1.0 - stopword_ratio)
             + 0.3 * least(n_ws_tokens / 100.0, 1.0), 7) AS quality
FROM r"""


def sql_language_id() -> str:
    from searchenginepp_spark.operators.text_analysis import LANG_MARKERS

    score_rows = " UNION ALL ".join(
        "SELECT doc_id AS docid, '" + lang + "' AS lang, ("
        + " + ".join(
            f"len(regexp_extract_all(lower(text), '\\b{w}\\b'))"
            for w in words)
        + ")::BIGINT AS score FROM documents"
        for lang, words in sorted(LANG_MARKERS.items())
    )
    return f"""
WITH scores AS ({score_rows}),
  ranked AS (
    SELECT docid, lang, score,
           ROW_NUMBER() OVER (PARTITION BY docid
                              ORDER BY score DESC, lang DESC) AS rn
    FROM scores
  )
SELECT docid,
       CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred,
       score AS lang_score
FROM ranked WHERE rn = 1"""


def sql_doc_fingerprint(k: int = 8, mod: int = 8) -> str:
    from searchenginepp_spark.operators.text_analysis import (
        FP_BASE, FP_MIX, FP_SPACE,
    )

    # same codepoint-polynomial + multiplicative-finish hash as
    # text_analysis.fp_gram_hashes (numpy) / doc_fingerprint_sql (Spark)
    poly = " + ".join(
        f"unicode(substr(gram, {j + 1}, 1))::BIGINT * {FP_BASE ** (k - 1 - j)}"
        for j in range(k))
    return f"""
WITH base AS (
    SELECT doc_id AS docid, lower(text) AS lt,
           greatest(length(text) - {k - 1}, 0)::BIGINT AS n_grams
    FROM documents
  ),
  gramtxt AS (
    SELECT docid, substr(lt, i, {k}) AS gram
    FROM base, UNNEST(generate_series(1, n_grams)) AS g(i)
  ),
  grams AS (
    SELECT docid,
           (((({poly}) % {FP_SPACE}) * {FP_MIX}) >> 28) & {FP_SPACE - 1} AS h
    FROM gramtxt
  ),
  sel AS (
    SELECT docid, list_sort(list(DISTINCT h)) AS hs, COUNT(DISTINCT h)::BIGINT AS n_selected
    FROM grams WHERE h % {mod} = 0 GROUP BY docid
  )
SELECT b.docid, b.n_grams,
       COALESCE(s.n_selected, 0) AS n_selected,
       md5(COALESCE(array_to_string(s.hs, ':'), '')) AS fingerprint
FROM base b LEFT JOIN sel s ON s.docid = b.docid"""


def cte_lsh_band_buckets(dims: int, n_bands: int, n_rows: int) -> str:
    """Banded multi-table variant — band t's bucket uses planes
    [t·n_rows, (t+1)·n_rows), mirroring similarity.lsh_band_buckets."""
    signs = plane_signs(n_bands * n_rows, dims)
    selects = []
    for t in range(n_bands):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(e, "
            f"{_plane_array_sql(signs[t * n_rows + s])}) > 0 "
            f"THEN {1 << s} ELSE 0 END)"
            for s in range(n_rows)
        )
        selects.append(f"SELECT vec_id, e, norm, {t}::BIGINT AS band, "
                       f"({bits})::BIGINT AS bucket FROM base")
    union = " UNION ALL ".join(selects)
    return f"""
  base AS (
    SELECT vec_id, embedding::DOUBLE[] AS e,
           sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
    FROM embeddings
  ),
  banded AS ({union})"""


def sql_embedding_near_dup(dims: int, threshold: float = 0.45,
                           n_bands: int = 4, n_rows: int = 8) -> str:
    return f"""
WITH {cte_lsh_band_buckets(dims, n_bands, n_rows)},
  cand AS (
    SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
  ),
  scored AS (
    SELECT c.vec_id_a, c.vec_id_b,
           ROUND(list_dot_product(x.e, y.e) / (x.norm * y.norm), 6) AS cosine
    FROM cand c JOIN base x ON x.vec_id = c.vec_id_a
                JOIN base y ON y.vec_id = c.vec_id_b
  )
SELECT vec_id_a, vec_id_b, cosine FROM scored WHERE cosine >= {threshold}"""


# -------------------------------------------------- relational (TPC-H-ish)

def sql_pricing_summary(ship_cutoff: str) -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 6) AS sum_qty,
       ROUND(SUM(l_extendedprice), 6) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)
         AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{ship_cutoff}'
GROUP BY l_returnflag, l_linestatus"""


def sql_top_unshipped_orders(segment: str, date: str, n: int = 10) -> str:
    return f"""
SELECT o_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{date}'
  AND l_shipdate > TIMESTAMP '{date}'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT {n}"""


def sql_regional_revenue(region_name: str, year: int) -> str:
    return f"""
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = '{region_name}'
  AND o_orderdate >= TIMESTAMP '{year}-01-01'
  AND o_orderdate < TIMESTAMP '{year + 1}-01-01'
GROUP BY n_name"""


def sql_dedup_components(n: int = 3, num_perm: int = NUM_PERM,
                         bands: int = LSH_BANDS) -> str:
    """Transitive closure of the MinHash-LSH pair graph via a recursive CTE
    (hash-min closure): walk enumerates every (node, reachable-origin) pair
    from the symmetric edge set, so MIN(lab) per node is exactly the
    smallest docid in the node's component — the same labeling
    operators/dedup.py:connected_components converges to."""
    pairs_sql = sql_minhash_lsh(n, num_perm, bands)
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}
  ),
  edges AS (
    SELECT docid_a AS src, docid_b AS dst FROM pairs
    UNION ALL
    SELECT docid_b AS src, docid_a AS dst FROM pairs
  ),
  walk(node, lab) AS (
    SELECT doc_id::BIGINT, doc_id::BIGINT FROM documents
    UNION
    SELECT e.dst, w.lab FROM walk w JOIN edges e ON e.src = w.node
  )
SELECT node AS docid, MIN(lab)::BIGINT AS component,
       (CASE WHEN MIN(lab) = node THEN 1 ELSE 0 END)::BIGINT AS is_canonical
FROM walk GROUP BY node"""


_HASH_SPAN_SQL = "1152921504606846976.0"    # 2^60, the md5-prefix span


def _sample_u01(id_expr: str = "doc_id") -> str:
    return (f"(('0x' || substr(md5({id_expr}::VARCHAR), 1, 15))::BIGINT"
            f" / {_HASH_SPAN_SQL})")


def sql_sample_fraction(fractions: dict[str, float],
                        default_fraction: float = 0.0,
                        strata_col: str = "lang") -> str:
    """Mirrors operators/sampling.stratified_sample_fraction: hash-uniform
    u(docid) < fraction(stratum).  Both engines divide the SAME exact
    60-bit integer by the same power of two, so the IEEE doubles — and the
    kept sets — are bit-identical."""
    cases = " ".join(f"WHEN {strata_col} = '{k}' THEN {float(v)}"
                     for k, v in sorted(fractions.items()))
    return f"""
SELECT doc_id::BIGINT AS docid, {strata_col} FROM documents
WHERE {_sample_u01()} < (CASE {cases} ELSE {float(default_fraction)} END)"""


def sql_sample_cap(cap: int, strata_col: str = "lang") -> str:
    """Mirrors operators/sampling.stratified_sample_cap: per-stratum
    row_number over (hash(docid), docid) ≤ cap."""
    return f"""
SELECT docid, {strata_col}, sample_rank FROM (
  SELECT doc_id::BIGINT AS docid, {strata_col},
         ROW_NUMBER() OVER (
           PARTITION BY {strata_col}
           ORDER BY {_sample_u01()} ASC, doc_id ASC)::BIGINT AS sample_rank
  FROM documents
) WHERE sample_rank <= {cap}"""


def sql_contamination(n: int = 3, min_shared: int = 3,
                      bench_mod: int = 100, bench_rem: int = 7) -> str:
    """Mirrors operators/text_analysis.contamination_check with the driver's
    deterministic benchmark split (doc_id % bench_mod == bench_rem)."""
    return f"""
WITH {cte_raw_tokens()}, {cte_shingles(n)},
  bsh AS (
    SELECT docid AS bench_id, shingle FROM dsh
    WHERE docid % {bench_mod} = {bench_rem}
  ),
  tsh AS (
    SELECT docid, shingle FROM dsh WHERE docid % {bench_mod} <> {bench_rem}
  ),
  hits AS (
    SELECT t.docid, t.shingle, b.bench_id
    FROM tsh t JOIN bsh b USING (shingle)
  )
SELECT docid, COUNT(DISTINCT shingle)::BIGINT AS n_shared_shingles,
       COUNT(DISTINCT bench_id)::BIGINT AS n_benchmark_docs
FROM hits GROUP BY docid
HAVING COUNT(DISTINCT shingle) >= {min_shared}"""
