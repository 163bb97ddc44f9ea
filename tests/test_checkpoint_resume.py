"""Kill/restart resumability (north rule): a killed build must resume from
its per-bucket checkpoints without recomputing finished work, and the
resumed index must answer queries identically to a one-shot build."""

import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.bmm import search_bmm
from searchenginepp_spark.operators.index_build import IndexPaths, build_index
from searchenginepp_spark.operators.query import search
from searchenginepp_spark.plans.checkpoint import (
    BuildKilled, build_index_resumable, load_manifest,
)
from searchenginepp_spark.sources.corpus import synthesize_corpus

N_DOCS = 200
N_BUCKETS = 4

QUERIES = [(1, "sym1 sym2"), (2, "int return"), (3, "fn_1 sym5 const")]


def _rows(df):
    return sorted(
        (r["qid"], r["docid"], r["rank"], round(r["score"], 6))
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return synthesize_corpus(spark, N_DOCS)


def test_kill_then_resume(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt"))

    with pytest.raises(BuildKilled):
        build_index_resumable(spark, corpus, root, n_buckets=N_BUCKETS,
                              salt_target=64, block_size=16,
                              fail_after_buckets=2)

    m1 = load_manifest(IndexPaths(root))
    done1 = {k: v["completed_at"] for k, v in m1["stages"].items()}
    assert "postings" in done1 and "lexicon" in done1
    assert sum(k.startswith("bucket:") for k in done1) == 2
    assert "complete" not in done1
    # lineage + throughput metrics recorded per completed bucket
    for k, v in m1["stages"].items():
        if k.startswith("bucket:"):
            assert v["lineage"]["output"].startswith(root)
            assert v["postings_per_sec"] is None or v["postings_per_sec"] > 0
    assert m1["stages"]["postings"]["postings_per_sec"] > 0

    # resume: finishes the remaining buckets, does NOT redo completed stages
    paths = build_index_resumable(spark, corpus, root, n_buckets=N_BUCKETS,
                                  salt_target=64, block_size=16)
    m2 = load_manifest(paths)
    assert "complete" in m2["stages"]
    assert sum(k.startswith("bucket:") for k in m2["stages"]) == N_BUCKETS
    for k, t in done1.items():
        assert m2["stages"][k]["completed_at"] == t, f"stage {k} was recomputed"


def test_resumed_index_matches_oneshot(spark, corpus, tmp_path_factory):
    ck_root = str(tmp_path_factory.mktemp("ckpt2"))
    os_root = str(tmp_path_factory.mktemp("oneshot"))

    try:
        build_index_resumable(spark, corpus, ck_root, n_buckets=N_BUCKETS,
                              salt_target=64, block_size=16,
                              fail_after_buckets=1)
    except BuildKilled:
        pass
    build_index_resumable(spark, corpus, ck_root, n_buckets=N_BUCKETS,
                          salt_target=64, block_size=16)
    build_index(spark, corpus, os_root, salt_target=64, block_size=16)

    # identical postings content
    ck = spark.read.parquet(f"{ck_root}/index_shards")
    assert ck.agg(F.sum("df_shard")).collect()[0][0] == \
        spark.read.parquet(f"{os_root}/index_shards").agg(
            F.sum("df_shard")).collect()[0][0]

    # identical query answers via both the exact and the BMM path
    for fn in (search, search_bmm):
        assert _rows(fn(spark, ck_root, QUERIES, k=10)) == \
            _rows(fn(spark, os_root, QUERIES, k=10))


def test_config_change_invalidates(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ckpt3"))
    build_index_resumable(spark, corpus, root, n_buckets=2,
                          salt_target=64, block_size=16)
    t_first = load_manifest(IndexPaths(root))["stages"]["postings"]["completed_at"]
    # different block_size → new fingerprint → stages recompute
    build_index_resumable(spark, corpus, root, n_buckets=2,
                          salt_target=64, block_size=32)
    m = load_manifest(IndexPaths(root))
    assert m["stages"]["postings"]["completed_at"] > t_first


def test_shrinking_n_buckets_purges_stale_dirs(spark, corpus, tmp_path_factory):
    """Re-running with fewer buckets must not leave stale bucket=<i> dirs
    for partition discovery to read alongside the rebuilt ones (ADVICE
    round 1): postings count and query results must match a fresh build."""
    from searchenginepp_spark.operators.query import search

    root = str(tmp_path_factory.mktemp("ck_shrink"))
    build_index_resumable(spark, corpus, root, n_buckets=4,
                          salt_target=64, block_size=16)
    n_postings_4 = spark.read.parquet(f"{root}/index_shards").agg(
        F.sum("df_shard")).collect()[0][0]
    build_index_resumable(spark, corpus, root, n_buckets=2,
                          salt_target=64, block_size=16)
    import os
    dirs = [d for d in os.listdir(f"{root}/index_shards")
            if d.startswith("bucket=")]
    assert sorted(dirs) == ["bucket=0", "bucket=1"]
    n_postings_2 = spark.read.parquet(f"{root}/index_shards").agg(
        F.sum("df_shard")).collect()[0][0]
    assert n_postings_2 == n_postings_4
    fresh = str(tmp_path_factory.mktemp("ck_fresh"))
    build_index_resumable(spark, corpus, fresh, n_buckets=2,
                          salt_target=64, block_size=16)
    q = [(1, "sym1 sym2"), (2, "int return")]
    got = sorted(map(tuple, search(spark, root, q, k=10).collect()))
    want = sorted(map(tuple, search(spark, fresh, q, k=10).collect()))
    assert got == want
