"""File-level heavy-term sampling: with a many-file corpus the df
estimation pass must read a FILE SUBSET (not scan all bytes), record its
lineage in the build manifest, and reach the same salting decisions as the
exact df computation (sampling is a perf knob, never a correctness one)."""

import json

import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.index_build import (
    build_index, explode_postings,
)
from searchenginepp_spark.operators.query import search
from searchenginepp_spark.sources.corpus import synthesize_corpus

N_DOCS = 600
SALT_TARGET = 64


@pytest.fixture(scope="module")
def many_file_corpus(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("many_files") / "corpus")
    synthesize_corpus(spark, N_DOCS).repartition(16).write.parquet(src)
    return spark.read.parquet(src)


def test_default_build_uses_exact_cached_df(spark, many_file_corpus,
                                            tmp_path_factory):
    """cache_postings=True (default): ONE tokenize pass, docmap doclens and
    heavy-term df from the cached postings — salting is exact, no sampling."""
    root = str(tmp_path_factory.mktemp("exact_index"))
    build_index(spark, many_file_corpus, root, salt_target=SALT_TARGET,
                block_size=16)
    manifest = json.load(open(f"{root}/manifest/build_manifest.json"))
    assert manifest["sampling"]["mode"] == "exact_cached_postings"
    prepared = many_file_corpus.withColumn(
        "docid", F.monotonically_increasing_id())
    exact_heavy = {
        r["term"]
        for r in explode_postings(prepared).groupBy("term")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SALT_TARGET).collect()
    }
    assert set(manifest["heavy_terms"]) == exact_heavy
    got = search(spark, root, [(1, "int return"), (2, "sym1 sym2")], k=5)
    assert got.count() == 10


def test_cached_build_matches_two_pass_build(spark, many_file_corpus,
                                             tmp_path_factory):
    """The single-tokenize cached build and the two-pass fallback must
    produce identical docmaps (incl. doclens) and query results."""
    a = str(tmp_path_factory.mktemp("cached"))
    b = str(tmp_path_factory.mktemp("twopass"))
    build_index(spark, many_file_corpus, a, salt_target=SALT_TARGET,
                block_size=16, cache_postings=True)
    build_index(spark, many_file_corpus, b, salt_target=SALT_TARGET,
                block_size=16, cache_postings=False)
    dm_a = sorted(map(tuple, spark.read.parquet(f"{a}/docmap").collect()))
    dm_b = sorted(map(tuple, spark.read.parquet(f"{b}/docmap").collect()))
    assert dm_a == dm_b
    q = [(1, "int return sym1"), (2, "twinkle wonder")]
    ra = sorted(map(tuple, search(spark, a, q, k=10).collect()))
    rb = sorted(map(tuple, search(spark, b, q, k=10).collect()))
    assert ra == rb


def test_file_sampling_engages_and_matches_exact_salting(
        spark, many_file_corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fs_index"))
    build_index(spark, many_file_corpus, root, salt_target=SALT_TARGET,
                block_size=16, sample_docs_target=150,   # force frac < 1
                cache_postings=False)
    manifest = json.load(open(f"{root}/manifest/build_manifest.json"))
    assert manifest["sampling"]["mode"] == "files"
    assert 0 < manifest["sampling"]["files_sampled"] < 16
    assert manifest["sampling"]["sampled_bytes"] > 0
    assert manifest["sampling"]["sampled_docs"] < N_DOCS

    # exact heavy set: df > salt_target (what an exhaustive pass would salt)
    from searchenginepp_spark.sources.corpus import load_corpus  # noqa: F401
    prepared = many_file_corpus.withColumn(
        "docid", F.monotonically_increasing_id())
    exact_df = {
        r["term"]: r["df"]
        for r in explode_postings(prepared).groupBy("term")
        .agg(F.count("*").alias("df")).collect()
    }
    clearly_heavy = {t for t, d in exact_df.items() if d > 2 * SALT_TARGET}
    clearly_light = {t for t, d in exact_df.items() if d <= SALT_TARGET // 4}
    sampled_heavy = set(manifest["heavy_terms"])
    assert clearly_heavy <= sampled_heavy, clearly_heavy - sampled_heavy
    assert not (clearly_light & sampled_heavy)

    # and the index built over the sampled salting still answers correctly
    got = search(spark, root, [(1, "int return"), (2, "sym1 sym2")], k=5)
    assert got.count() == 10


def test_small_corpus_two_pass_skips_sampling(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nos_index"))
    corpus = synthesize_corpus(spark, 100)
    build_index(spark, corpus, root, salt_target=SALT_TARGET, block_size=16,
                cache_postings=False)
    manifest = json.load(open(f"{root}/manifest/build_manifest.json"))
    assert manifest["sampling"]["mode"] == "none"
    assert manifest["n_heavy_terms"] == 0
