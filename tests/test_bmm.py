"""BMM (Block-Max MaxScore) fast path must be rank-identical to the exact
DataFrame path — the invariant the reference aims for between its DAAT and
BMM processors (/root/reference/src/index/Index.cpp:15-133), which we make
airtight by not quantizing the stored bounds (SURVEY.md §4)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.bmm import (
    _ListCursor, _make_scorer, maxscore_query, search_bmm,
)
from searchenginepp_spark.operators.index_build import build_index
from searchenginepp_spark.operators.query import search
from searchenginepp_spark.sources.corpus import synthesize_corpus

N_DOCS = 300

QUERIES = [
    (1, "sym1 sym2"),
    (2, "int return"),                  # head (salted) terms
    (3, "twinkle wonder"),              # stemmable english
    (4, "sym1 sym1"),                   # repeated term dedupes
    (5, "nonexistenttermxyz sym3"),     # missing term dropped
    (6, "the and from"),                # stopword-only → empty
    (7, "fn_1 fn_2 sym5 int"),          # mix of rare + head
    (8, "sym7"),                        # single list — degenerate MaxScore
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bmm_index"))
    corpus = synthesize_corpus(spark, N_DOCS)
    # tiny blocks + tiny salt target: many blocks per list, salted heads —
    # the pruning machinery actually engages at this scale
    build_index(spark, corpus, root, salt_target=64, block_size=16)
    return root


def _rows(df):
    return sorted(
        (r["qid"], r["docid"], r["rank"], round(r["score"], 6))
        for r in df.collect()
    )


@pytest.mark.parametrize("scorer", ["bm25", "tfidf"])
def test_bmm_rank_identical_to_exact(spark, built, scorer):
    exact = search(spark, built, QUERIES, k=10, scorer=scorer)
    bmm = search_bmm(spark, built, QUERIES, k=10, scorer=scorer)
    assert _rows(bmm) == _rows(exact)


def test_bmm_k1_and_large_k(spark, built):
    for k in (1, 1000):
        exact = search(spark, built, QUERIES[:4], k=k)
        bmm = search_bmm(spark, built, QUERIES[:4], k=k)
        assert _rows(bmm) == _rows(exact)


def test_bmm_empty_query_batch(spark, built):
    assert search_bmm(spark, built, [(1, "the and")], k=10).count() == 0


def test_block_decode_standalone(spark, built):
    """Every block must decode without touching earlier blocks (prev_docid
    carries the delta-gap base across the boundary)."""
    row = (
        spark.read.parquet(f"{built}/index_shards")
        .filter(F.size("skips") >= 3).limit(1).collect()
    )[0]

    class R:  # minimal row shim for _ListCursor
        sigma_bm25_part = row["sigma_bm25_part"]
        sigma_tfidf_part = row["sigma_tfidf_part"]
        skips = row["skips"]
        docid_blob = row["docid_blob"]
        tf_blob = row["tf_blob"]
        doclen_blob = row["doclen_blob"]
        df_global = 10
        n_docs_f = 100.0

    cur = _ListCursor(R, "bm25")
    fn = _make_scorer("bm25", 100.0, 0.82, 0.68)
    all_ids, _ = cur.decode_all(fn)
    # strictly increasing across block boundaries, ends match skip metadata
    assert (np.diff(all_ids) > 0).all()
    assert all_ids[-1] == row["last_docid"]
    assert len(all_ids) == row["df_shard"]
    for b, e in enumerate(row["skips"]):
        ids_b, _ = cur.decode_block(b, fn)
        assert ids_b[-1] == e["last_docid"]
        assert len(ids_b) == e["n_postings"]


def test_maxscore_prunes_blocks(spark, built):
    """The fast path must actually skip block decodes on a selective query
    (rare term + head term): after the run, the head-term cursors must have
    decoded fewer blocks than they contain."""
    from searchenginepp_spark.operators.query import normalize_queries, queries_df

    qterms = normalize_queries(queries_df(spark, [(1, "sym1 int")]), stem=True)
    terms = [r["term"] for r in qterms.collect()]
    stats = spark.read.parquet(f"{built}/stats").collect()[0]
    n_docs, avgdl = stats["n_docs"], stats["sum_doclen"] / stats["n_docs"]
    lex = {r["term"]: r["df"]
           for r in spark.read.parquet(f"{built}/global_lexicon")
           .filter(F.col("term").isin(terms)).collect()}
    rows = (
        spark.read.parquet(f"{built}/index_shards")
        .filter(F.col("term").isin(terms)).collect()
    )

    class R:
        def __init__(self, row):
            for f in ("sigma_bm25_part", "sigma_tfidf_part", "skips", "docid_blob",
                      "tf_blob", "doclen_blob"):
                setattr(self, f, row[f])
            self.df_global = lex[row["term"]]
            self.n_docs_f = float(n_docs)
            self.term = row["term"]

    fn = _make_scorer("bm25", float(avgdl), 0.82, 0.68)
    cursors = [_ListCursor(R(r), "bm25") for r in rows]
    by_term = {}
    for r, c in zip(rows, cursors):
        by_term.setdefault(r["term"], []).append(c)
    ids, sc = maxscore_query(cursors, 10, fn)
    assert ids.size >= 10
    total_blocks = sum(c.n_blocks for c in by_term["int"])
    decoded = sum(len(c._cache) for c in by_term["int"])
    assert decoded < total_blocks, (
        f"head-term lists fully decoded ({decoded}/{total_blocks}) — pruning inert")
