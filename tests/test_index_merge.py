"""Segment merge: merging independently-built indexes must answer queries
identically (by docno + score) to a from-scratch build over the whole
corpus — blobs untouched, only skip metadata rebased."""

import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.bmm import search_bmm
from searchenginepp_spark.operators.index_build import build_index
from searchenginepp_spark.operators.index_merge import merge_indexes
from searchenginepp_spark.operators.local_engine import LocalSearcher
from searchenginepp_spark.operators.query import search
from searchenginepp_spark.sources.corpus import synthesize_corpus

N_DOCS = 240
QUERIES = [(1, "sym1 sym2"), (2, "int return"), (3, "twinkle wonder"),
           (4, "fn_1 sym5 int")]
BIG_K = 10_000            # k > any result set: tie ORDER can't change the SET


@pytest.fixture(scope="module")
def merged_and_full(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    corpus = synthesize_corpus(spark, N_DOCS).cache()
    half_a = corpus.filter(F.crc32("path") % 2 == 0)
    half_b = corpus.filter(F.crc32("path") % 2 == 1)
    build_index(spark, half_a, str(base / "a"), salt_target=64, block_size=16)
    build_index(spark, half_b, str(base / "b"), salt_target=64, block_size=16)
    build_index(spark, corpus, str(base / "full"), salt_target=64,
                block_size=16)
    merge_indexes(spark, [str(base / "a"), str(base / "b")],
                  str(base / "merged"))
    return str(base / "merged"), str(base / "full")


def _by_docno(df):
    return sorted((r["qid"], r["docno"], round(r["score"], 6))
                  for r in df.collect())


def test_merged_stats_and_lexicon_sum(spark, merged_and_full):
    merged, full = merged_and_full
    sm = spark.read.parquet(f"{merged}/stats").collect()[0]
    sf = spark.read.parquet(f"{full}/stats").collect()[0]
    assert (sm["n_docs"], sm["sum_doclen"]) == (sf["n_docs"], sf["sum_doclen"])
    lm = {r["term"]: r["df"]
          for r in spark.read.parquet(f"{merged}/global_lexicon").collect()}
    lf = {r["term"]: r["df"]
          for r in spark.read.parquet(f"{full}/global_lexicon").collect()}
    assert lm == lf


def test_merged_docids_unique_and_docmap_complete(spark, merged_and_full):
    merged, full = merged_and_full
    dm = spark.read.parquet(f"{merged}/docmap")
    assert dm.count() == N_DOCS
    assert dm.select("docid").distinct().count() == N_DOCS
    # every docno of the full build is present
    full_docnos = {r["docno"] for r in
                   spark.read.parquet(f"{full}/docmap").collect()}
    assert {r["docno"] for r in dm.collect()} == full_docnos


@pytest.mark.parametrize("scorer", ["bm25", "tfidf"])
def test_merged_equals_full_build_exact_path(spark, merged_and_full, scorer):
    merged, full = merged_and_full
    got = _by_docno(search(spark, merged, QUERIES, k=BIG_K, scorer=scorer))
    want = _by_docno(search(spark, full, QUERIES, k=BIG_K, scorer=scorer))
    assert got == want


def test_merged_bmm_and_local_match_exact(spark, merged_and_full):
    merged, _ = merged_and_full
    exact = _by_docno(search(spark, merged, QUERIES, k=10))
    bmm = _by_docno(search_bmm(spark, merged, QUERIES, k=10))
    bmm2 = _by_docno(search_bmm(spark, merged, QUERIES, k=10, n_ranges=3))
    assert bmm == exact
    assert bmm2 == exact
    ls = LocalSearcher(merged)
    local = sorted((q, docno, round(s, 6))
                   for q, _d, docno, _r, s in ls.search(QUERIES, k=10))
    assert local == exact


def test_merge_rejects_single_source(spark, merged_and_full, tmp_path):
    merged, _ = merged_and_full
    with pytest.raises(ValueError):
        merge_indexes(spark, [merged], str(tmp_path / "x"))


def test_merge_of_merged_segments(spark, merged_and_full, tmp_path_factory):
    """Re-merging an already-merged segment must compose docid bases
    (docid_base accumulates; skips rebase again)."""
    base = tmp_path_factory.mktemp("remerge")
    merged, full = merged_and_full
    extra = synthesize_corpus(spark, 60, seed=99)
    build_index(spark, extra, str(base / "c"), salt_target=64, block_size=16)
    merge_indexes(spark, [merged, str(base / "c")], str(base / "m2"))

    big = synthesize_corpus(spark, N_DOCS).unionByName(extra)
    build_index(spark, big, str(base / "full2"), salt_target=64,
                block_size=16)
    got = _by_docno(search(spark, str(base / "m2"), QUERIES, k=BIG_K))
    want = _by_docno(search(spark, str(base / "full2"), QUERIES, k=BIG_K))
    assert got == want
    dm = spark.read.parquet(f"{base}/m2/docmap")
    assert dm.select("docid").distinct().count() == N_DOCS + 60


def test_compaction_defragments_and_preserves_results(spark, merged_and_full,
                                                      tmp_path_factory):
    """compact_index rewrites a fragmented merged index into freshly
    encoded shards: fewer rows per term, identical answers."""
    from searchenginepp_spark.operators.index_merge import compact_index

    merged, _ = merged_and_full
    out = str(tmp_path_factory.mktemp("compacted"))
    compact_index(spark, merged, out, salt_target=64, block_size=16)

    rows_before = (spark.read.parquet(f"{merged}/index_shards")
                   .groupBy("term").count())
    rows_after = (spark.read.parquet(f"{out}/index_shards")
                  .groupBy("term").count())
    before = {r["term"]: r["count"] for r in rows_before.collect()}
    after = {r["term"]: r["count"] for r in rows_after.collect()}
    assert set(after) == set(before)
    assert all(after[t] <= before[t] for t in after)
    assert any(after[t] < before[t] for t in after)   # actually defragmented

    got = _by_docno(search(spark, out, QUERIES, k=BIG_K))
    want = _by_docno(search(spark, merged, QUERIES, k=BIG_K))
    assert got == want
    # pruned fast path + serving reader still work on the compacted index
    assert _by_docno(search_bmm(spark, out, QUERIES, k=10)) == \
        _by_docno(search(spark, out, QUERIES, k=10))


def test_merged_bmm_sound_under_avgdl_shift(spark, tmp_path_factory):
    """Adversarial merge: segment A has SHORT docs (small avgdl), segment B
    long docs, so the merged collection avgdl far exceeds A's encode-time
    avgdl and A's stored BM25 bounds understate true scores.  The
    avgdl_encode scaling must keep BMM (and LocalSearcher) rank-identical
    to the exact path on the merged index."""
    base = tmp_path_factory.mktemp("avgdl_shift")
    short_rows = [("orgA", f"a{i}.c", f"c{i:040d}", "c",
                   f"alphaterm betaterm sym{i % 7}")
                  for i in range(60)]
    long_rows = [("orgB", f"b{i}.c", f"d{i:040d}", "c",
                  ("alphaterm " if i % 3 == 0 else "")
                  + "filler" + " filler" * 400 + f" sym{i % 7}")
                 for i in range(60)]
    schema = "repo string, path string, commit string, lang string, content string"
    a = spark.createDataFrame(short_rows, schema)
    b = spark.createDataFrame(long_rows, schema)
    build_index(spark, a, str(base / "a"), salt_target=16, block_size=8)
    build_index(spark, b, str(base / "b"), salt_target=16, block_size=8)
    merge_indexes(spark, [str(base / "a"), str(base / "b")],
                  str(base / "m"))
    sa = spark.read.parquet(f"{base}/a/stats").collect()[0]
    sm = spark.read.parquet(f"{base}/m/stats").collect()[0]
    avgdl_a = sa["sum_doclen"] / sa["n_docs"]
    avgdl_m = sm["sum_doclen"] / sm["n_docs"]
    assert avgdl_m > 10 * avgdl_a            # the shift is real

    queries = [(1, "alphaterm betaterm"), (2, "alphaterm sym1"),
               (3, "betaterm sym2 filler")]
    for k in (3, 5, 10):
        exact = _by_docno(search(spark, str(base / "m"), queries, k=k,
                                 stem=False))
        bmm = _by_docno(search_bmm(spark, str(base / "m"), queries, k=k,
                                   stem=False))
        bmm2 = _by_docno(search_bmm(spark, str(base / "m"), queries, k=k,
                                    stem=False, n_ranges=2))
        assert bmm == exact, f"k={k}"
        assert bmm2 == exact, f"k={k} two-level"
    ls = LocalSearcher(str(base / "m"), stem=False)
    local = sorted((q, docno, round(s, 6))
                   for q, _d, docno, _r, s in ls.search(queries, k=5))
    assert local == _by_docno(search(spark, str(base / "m"), queries, k=5,
                                     stem=False))


def test_merge_backfills_null_avgdl_encode(spark, tmp_path):
    """A legacy segment lacking the avgdl_encode column (pre-schema build)
    must have it BACKFILLED from the segment's own stats at merge time —
    _ListCursor skips bound scaling on null, which is unsound once the
    merged collection avgdl exceeds the legacy segment's (ADVICE round 2).
    Short legacy segment + long other segment makes the merged avgdl exceed
    the legacy encode avgdl, the exact case the scaling protects."""
    corpus = synthesize_corpus(spark, 200).cache()
    doclens = corpus.withColumn("n", F.size(F.split("content", " ")))
    short = doclens.filter(F.col("n") <= 150).drop("n")
    long_ = doclens.filter(F.col("n") > 150).drop("n")
    assert short.count() and long_.count()

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, short, a, salt_target=64, block_size=16)
    build_index(spark, long_, b, salt_target=64, block_size=16)

    # strip avgdl_encode from segment a — simulate a pre-schema segment
    legacy = spark.read.parquet(f"{a}/index_shards").drop("avgdl_encode")
    legacy_dir = str(tmp_path / "a_legacy_shards")
    legacy.write.parquet(legacy_dir)
    import shutil
    shutil.rmtree(f"{a}/index_shards")
    shutil.move(legacy_dir, f"{a}/index_shards")

    merged = str(tmp_path / "merged")
    merge_indexes(spark, [a, b], merged)
    sh = spark.read.parquet(f"{merged}/index_shards")
    assert sh.filter(F.col("avgdl_encode").isNull()).count() == 0
    # the backfilled value equals segment a's own stats avgdl
    sa = spark.read.parquet(f"{a}/stats").collect()[0]
    avgdl_a = sa["sum_doclen"] / sa["n_docs"]
    got = {round(r["avgdl_encode"], 6) for r in
           sh.filter(F.col("shard") < 1 << 32).select("avgdl_encode")
           .distinct().collect()}
    assert got == {round(avgdl_a, 6)}
    # and BMM over the merged index stays rank-identical to exact
    exact = _by_docno(search(spark, merged, QUERIES, k=10))
    bmm = _by_docno(search_bmm(spark, merged, QUERIES, k=10))
    bmm2 = _by_docno(search_bmm(spark, merged, QUERIES, k=10, n_ranges=3))
    assert bmm == exact
    assert bmm2 == exact
