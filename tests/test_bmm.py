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
    # a cursor promoted to the cached full decode (_full) cleared its
    # per-block cache — count it as having decoded every block
    decoded = sum(c.n_blocks if c._full is not None else len(c._cache)
                  for c in by_term["int"])
    assert decoded < total_blocks, (
        f"head-term lists fully decoded ({decoded}/{total_blocks}) — pruning inert")


@pytest.mark.parametrize("n_ranges", [2, 4, 7])
def test_bmm_two_level_rank_identical(spark, built, n_ranges):
    """The docid-range fan-out (level-1 slice → per-range MaxScore →
    level-2 merge) must stay rank-identical to the exact path for any
    range count, including ones that don't divide the docid span."""
    exact = search(spark, built, QUERIES, k=10)
    bmm = search_bmm(spark, built, QUERIES, k=10, n_ranges=n_ranges)
    assert _rows(bmm) == _rows(exact)


def test_bmm_auto_ranges_engage(spark, built):
    """With range_target below the head-term df the auto fan-out must pick
    n_ranges > 1 and still match the exact path."""
    exact = search(spark, built, [(2, "int return")], k=10)
    bmm = search_bmm(spark, built, [(2, "int return")], k=10,
                     range_target=32)
    assert _rows(bmm) == _rows(exact)


def test_auto_ranges_never_slice_below_target():
    """VERDICT round 3 #6: auto mode must NEVER slice a query whose matched
    postings fit one task (forced slicing at toy scale measured ~60% extra,
    BENCH_r03) — and must slice exactly ceil(worst/target) otherwise."""
    from searchenginepp_spark.operators.bmm import _auto_n_ranges

    qt = [(1, "a"), (1, "b"), (2, "c")]
    dfs = {"a": 400, "b": 600, "c": 50}
    # worst query (qid=1) has 1000 matched postings
    assert _auto_n_ranges(qt, dfs, range_target=1000) == 1
    assert _auto_n_ranges(qt, dfs, range_target=10_000_000) == 1
    assert _auto_n_ranges(qt, dfs, range_target=999) == 2
    assert _auto_n_ranges(qt, dfs, range_target=250) == 4
    assert _auto_n_ranges([], {}, range_target=100) == 1
    # terms missing from the lexicon contribute nothing
    assert _auto_n_ranges([(1, "zz")], dfs, range_target=1) == 1


def test_two_level_plan_shape(spark, built):
    """Scale-shape invariant: in the two-level plan the blob shuffle is
    keyed by (qid, range_id) — never by qid alone — so no single task holds
    a head term's full posting set (reference fans one query across
    doc-partitioned workers, engine.cpp:99-126)."""
    df = search_bmm(spark, built, QUERIES[:2], k=10, n_ranges=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    groups = re.findall(r"FlatMapGroupsInPandas \[([^\]]*)\]", plan)
    assert groups, "no applyInPandas stage found in plan"
    for keys in groups:  # the only blob-carrying shuffle is the MaxScore one
        assert "range_id" in keys, f"blob shuffle keyed by qid alone: {keys}"
    assert "hashpartitioning(qid" in plan  # level-2 merge window (tiny rows)


def test_block_decode_is_block_bounded(spark, built):
    """decode_block(b) must touch only block b's byte/bit span: decoding
    from blobs TRUNCATED at the block's end offsets must give identical
    output (O(block), not O(remaining list) — Index.cpp:181-214)."""
    row = (
        spark.read.parquet(f"{built}/index_shards")
        .filter(F.size("skips") >= 3).limit(1).collect()
    )[0]

    class R:
        sigma_bm25_part = row["sigma_bm25_part"]
        sigma_tfidf_part = row["sigma_tfidf_part"]
        skips = row["skips"]
        docid_blob = row["docid_blob"]
        tf_blob = row["tf_blob"]
        doclen_blob = row["doclen_blob"]
        df_global = 10
        n_docs_f = 100.0

    fn = _make_scorer("bm25", 100.0, 0.82, 0.68)
    full = _ListCursor(R, "bm25")
    for b in range(full.n_blocks):
        want_ids, want_sc = full.decode_block(b, fn)

        class T(R):  # truncate every blob right at block b's end
            docid_blob = bytes(row["docid_blob"])[:full._d_ends[b]]
            doclen_blob = bytes(row["doclen_blob"])[:full._l_ends[b]]
            tf_blob = bytes(row["tf_blob"])[:(full._t_bit_ends[b] + 7) >> 3]
            skips = row["skips"][:b + 1]

        got_ids, got_sc = _ListCursor(T, "bm25").decode_block(b, fn)
        assert (got_ids == want_ids).all()
        assert np.allclose(got_sc, want_sc)


def test_bmm_all_miss_query_explicit_ranges(spark, built):
    """Explicit n_ranges>1 with a query set whose terms are all absent from
    the index: the level-1 span agg sees zero shard rows (NULL lo/hi) and
    must fall back to the single-task path's empty result instead of
    crashing (ADVICE round 2)."""
    misses = [(1, "zzznope qqqabsent"), (2, "xxmissing")]
    exact = search(spark, built, misses, k=10)
    bmm = search_bmm(spark, built, misses, k=10, n_ranges=4)
    assert _rows(bmm) == _rows(exact) == []


def test_bmm_mixed_hit_and_miss_queries_two_level(spark, built):
    """One query hits, one misses entirely — the two-level path must return
    the hit query's results and nothing for the miss."""
    mixed = [(1, "sym1 sym2"), (2, "zzznope")]
    exact = search(spark, built, mixed, k=10)
    bmm = search_bmm(spark, built, mixed, k=10, n_ranges=4)
    assert _rows(bmm) == _rows(exact)
    assert {r[0] for r in _rows(bmm)} == {1}
