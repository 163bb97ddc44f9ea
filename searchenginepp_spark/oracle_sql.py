"""ANSI-SQL (DuckDB-dialect-compatible) oracle builders.

The driver's correctness gate runs each `__spark_entry__.queries()` entry on
Spark AND the matching `oracle_sql()` string on DuckDB over the same parquet
tables, then compares row counts / schemas / value hashes.  These builders
express the SAME semantics as the engine operators (stem=False — stemming is
not SQL-expressible; stemmed paths get rows-only checks).

Shared fixed constants (query set, BM25 params, punctuation class, stopword
list) live here so both sides can't drift.
"""

from __future__ import annotations

import os

from searchenginepp_spark.config import BM25_B, BM25_K1, MAX_TOKEN_LEN
from searchenginepp_spark.functions.normalizer import SQL_PUNCT_CLASS
from searchenginepp_spark.functions.stop_words import stop_words

# the class contains a literal ' — double it for SQL string context
_PUNCT_SQL = SQL_PUNCT_CLASS.replace("'", "''")

# (token -> Porter2 stem) lookup parquet covering the testdata vocabulary +
# QUERY_SET (regenerate: scripts/gen_stem_map.py).  Makes the stemmed path
# SQL-expressible: stem-after-filter (WordNormalizer.cpp:62-73) becomes a
# LEFT JOIN on this table after the tokenize CTE.
STEM_MAP_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "data", "stem_map.parquet")

# Fixed reference query set for the driver checks (vocabulary of the
# synthetic documents table; exercises head terms, dup terms, missing terms,
# stopword-only).
QUERY_SET: list[tuple[int, str]] = [
    (1, "spark query data"),
    (2, "hash join merge"),
    (3, "window agg batch"),
    (4, "stream stream data"),            # repeated term must dedupe
    (5, "nonexistenttermxyz filter"),     # disjunctive drops missing term
    (6, "the a and"),                     # stopword-only → empty
    (7, "vector column row scan"),
    (8, "customer order line"),
    (9, "queried merges customers"),    # inflected forms: match ONLY when
                                        # stemming maps them onto the corpus
                                        # vocabulary (queri/merg/custom) —
                                        # keeps the stemmed oracle non-vacuous
]

TOP_K = 10
ROUND = 6


def sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def stopword_in_list() -> str:
    return ", ".join(sql_str(w) for w in sorted(stop_words()))


def queries_values() -> str:
    return ", ".join(f"({qid}, {sql_str(text)})" for qid, text in QUERY_SET)


def cte_tokens(src: str = "documents", stemmed: bool = False) -> str:
    """Tokenize: punctuation→space, \\s+ split, lower, length cap, stop-word
    filter, then (stemmed=True) the Porter2 lookup join — same
    stem-AFTER-filter order as the engine. docid := doc_id."""
    stem_cte = ""
    tf_src = "tokens"
    if stemmed:
        tf_src = "stemmed"
        stem_cte = f""",
  stemmed AS (
    SELECT t.docid, COALESCE(m.stem, t.term) AS term
    FROM tokens t
    LEFT JOIN read_parquet('{STEM_MAP_PATH}') m ON m.token = t.term
  )"""
    return f"""
  raw_tokens AS (
    SELECT doc_id AS docid,
           unnest(string_split_regex(
             lower(regexp_replace(text, '{_PUNCT_SQL}', ' ', 'g')),
             '\\s+')) AS term
    FROM {src}
  ),
  tokens AS (
    SELECT docid, term FROM raw_tokens
    WHERE term <> '' AND length(term) <= {MAX_TOKEN_LEN}
      AND term NOT IN ({stopword_in_list()})
  ){stem_cte},
  tf AS (
    SELECT term, docid, COUNT(*)::BIGINT AS tf
    FROM {tf_src} GROUP BY term, docid
  )"""


def cte_doclen() -> str:
    """doclen per doc INCLUDING zero-token docs (document index keeps every
    ingested doc)."""
    return """
  doclen AS (
    SELECT d.doc_id AS docid,
           COALESCE(SUM(tf.tf), 0)::BIGINT AS doclen
    FROM documents d LEFT JOIN tf ON tf.docid = d.doc_id
    GROUP BY d.doc_id
  )"""


def cte_query_terms(stemmed: bool = False) -> str:
    # query set-dedup happens on the FINAL terms (engine.cpp:88-96 dedupes
    # post-normalization), so DISTINCT applies after the stem join
    term = "COALESCE(m.stem, qf.term)" if stemmed else "qf.term"
    join = (f"LEFT JOIN read_parquet('{STEM_MAP_PATH}') m ON m.token = qf.term"
            if stemmed else "")
    return f"""
  qraw AS (
    SELECT qid,
           unnest(string_split_regex(
             lower(regexp_replace(text, '{_PUNCT_SQL}', ' ', 'g')),
             '\\s+')) AS term
    FROM (VALUES {queries_values()}) AS q(qid, text)
  ),
  qfiltered AS (
    SELECT qid, term FROM qraw
    WHERE term <> '' AND length(term) <= {MAX_TOKEN_LEN}
      AND term NOT IN ({stopword_in_list()})
  ),
  qterms AS (
    SELECT DISTINCT qid, {term} AS term FROM qfiltered qf {join}
  )"""


def sql_postings_tf() -> str:
    return f"WITH {cte_tokens()} SELECT term, docid, tf FROM tf"


def sql_docmap_doclen() -> str:
    return f"WITH {cte_tokens()}, {cte_doclen()} SELECT docid, doclen FROM doclen"


def sql_global_lexicon() -> str:
    return (f"WITH {cte_tokens()} "
            "SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term")


def sql_collection_stats() -> str:
    return (f"WITH {cte_tokens()}, {cte_doclen()} "
            "SELECT COUNT(*)::BIGINT AS n_docs, SUM(doclen)::BIGINT AS sum_doclen "
            "FROM doclen")


def _scored(scorer: str) -> str:
    if scorer == "bm25":
        partial = (f"(p.tf / ({BM25_K1} * ((1 - {BM25_B}) + {BM25_B} * "
                   f"dl.doclen / s.avgdl) + p.tf)) * log2(s.n_docs / l.df)")
    else:
        partial = "(1 + log2(p.tf)) * log2(s.n_docs / l.df)"
    return f"""
  lex AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
  stats AS (
    SELECT (SELECT COUNT(*) FROM documents)::DOUBLE AS n_docs,
           (SELECT COALESCE(SUM(tf), 0) FROM tf)::DOUBLE
             / (SELECT COUNT(*) FROM documents) AS avgdl
  ),
  scored AS (
    SELECT q.qid, p.docid,
           SUM({partial}) AS score_raw,
           COUNT(*) AS n_matched
    FROM qterms q
    JOIN lex l ON l.term = q.term
    JOIN tf p ON p.term = q.term
    JOIN doclen dl ON dl.docid = p.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
  )"""


def sql_topk(scorer: str = "bm25", conjunctive: bool = False,
             k: int = TOP_K, stemmed: bool = False) -> str:
    conj = ""
    if conjunctive:
        conj = """
  n_terms AS (SELECT qid, COUNT(*) AS n FROM qterms GROUP BY qid),
  n_found AS (
    SELECT q.qid, COUNT(*) AS n FROM qterms q
    JOIN lex l ON l.term = q.term GROUP BY q.qid
  ),
  eligible AS (
    SELECT t.qid, t.n FROM n_terms t JOIN n_found f
    ON f.qid = t.qid AND f.n = t.n
  ),"""
        filt = ("JOIN eligible e ON e.qid = scored.qid "
                "AND scored.n_matched = e.n")
    else:
        filt = ""
    return f"""
WITH {cte_tokens(stemmed=stemmed)}, {cte_doclen()}, {cte_query_terms(stemmed=stemmed)}, {_scored(scorer)},{conj}
  ranked AS (
    SELECT scored.qid, scored.docid,
           ROW_NUMBER() OVER (
             PARTITION BY scored.qid
             ORDER BY ROUND(scored.score_raw, {ROUND}) DESC, scored.docid ASC
           ) AS rank,
           ROUND(scored.score_raw, {ROUND}) AS score
    FROM scored {filt}
  )
SELECT qid, docid, rank::BIGINT AS rank, score FROM ranked WHERE rank <= {k}
"""


def sql_eval_metrics(k: int = TOP_K, qrels_mod: int = 7,
                     ndcg_cut2: int | None = None) -> str:
    """Per-qid AP / nDCG@k / nDCG@min(k,20) / RR / set-P/R/F of the BM25 run
    against the deterministic synthetic qrels (relevant iff doc_id % mod ==
    qid % mod) — mirrors operators/evaluation.evaluate_topk
    expression-for-expression (truncated-run @k semantics; the second nDCG
    cut defaults to min(k, 20) in lockstep with evaluate_topk)."""
    if ndcg_cut2 is None:
        ndcg_cut2 = min(k, 20)
    return f"""
WITH run AS ({sql_topk("bm25", conjunctive=False, k=k)}),
  qids AS (
    SELECT DISTINCT qid FROM (VALUES {queries_values()}) AS q(qid, text)
  ),
  qrels AS (
    SELECT q.qid, d.doc_id AS docid, 1.0 AS gain
    FROM documents d CROSS JOIN qids q
    WHERE d.doc_id % {qrels_mod} = q.qid % {qrels_mod}
  ),
  judged AS (
    SELECT r.qid, r.docid, r.rank,
           COALESCE(qr.gain, 0.0) AS gain,
           CASE WHEN COALESCE(qr.gain, 0.0) > 0 THEN 1.0 ELSE 0.0 END AS hit
    FROM run r LEFT JOIN qrels qr ON qr.qid = r.qid AND qr.docid = r.docid
  ),
  cum AS (
    SELECT qid, gain, hit, rank,
           SUM(hit) OVER (PARTITION BY qid ORDER BY rank
                          ROWS UNBOUNDED PRECEDING) / rank AS prec_at
    FROM judged
  ),
  per_q AS (
    SELECT qid, SUM(hit * prec_at) AS sum_prec,
           SUM(gain / log2(rank + 1)) AS dcg,
           SUM(CASE WHEN rank <= {ndcg_cut2}
                    THEN gain / log2(rank + 1) ELSE 0 END) AS dcg2,
           MAX(CASE WHEN hit > 0 THEN 1.0 / rank END) AS rr,
           COUNT(*) AS n_retrieved,
           SUM(hit) AS n_rel_ret
    FROM cum GROUP BY qid
  ),
  ranked_rel AS (
    SELECT qid, gain,
           ROW_NUMBER() OVER (PARTITION BY qid
                              ORDER BY gain DESC, docid ASC) AS irank
    FROM qrels WHERE gain > 0
  ),
  ideal AS (
    SELECT qid, COUNT(*)::BIGINT AS n_relevant,
           SUM(CASE WHEN irank <= {k}
                    THEN gain / log2(irank + 1) ELSE 0 END) AS idcg,
           SUM(CASE WHEN irank <= {ndcg_cut2}
                    THEN gain / log2(irank + 1) ELSE 0 END) AS idcg2
    FROM ranked_rel GROUP BY qid
  ),
  sets AS (
    SELECT i.qid,
           COALESCE(p.n_rel_ret, 0.0)
             / greatest(COALESCE(p.n_retrieved, 0), 1) AS sp,
           COALESCE(p.n_rel_ret, 0.0) / i.n_relevant AS sr
    FROM ideal i LEFT JOIN per_q p ON p.qid = i.qid
  )
SELECT i.qid,
       ROUND(COALESCE(p.sum_prec, 0) / i.n_relevant, 6) AS ap,
       ROUND(COALESCE(p.dcg, 0) / i.idcg, 6) AS ndcg,
       ROUND(COALESCE(p.dcg2, 0) / i.idcg2, 6) AS ndcg_20,
       ROUND(COALESCE(p.rr, 0), 6) AS rr,
       ROUND(s.sp, 6) AS set_p,
       ROUND(s.sr, 6) AS set_r,
       ROUND(CASE WHEN s.sp + s.sr > 0
                  THEN 2 * s.sp * s.sr / (s.sp + s.sr) ELSE 0.0 END, 6)
         AS set_f,
       i.n_relevant
FROM ideal i LEFT JOIN per_q p ON p.qid = i.qid
JOIN sets s ON s.qid = i.qid"""
