"""Cache-pressure auto-fallback (VERDICT round 4 #1) and the JVM-side
doclen pass (round 4 #6).

The build holds two caches (docid corpus pin + postings persist); on
fixed-memory executors they must flip to DISK_ONLY before they thrash the
unified region (the measured 2M-docs-on-a-4GB-executor pathology).  The
decision is estimated from input bytes BEFORE the first pass; these tests
pin the decision logic, the disk-mode end-to-end parity, and the
doclen_jvm ≡ doclen_udf semantics the two-pass build now relies on.
"""

import json

import pytest
from pyspark.sql import functions as F

import searchenginepp_spark.operators.index_build as ib
from searchenginepp_spark.operators.index_build import (
    build_index, doclen_jvm, doclen_udf, resolve_cache_postings,
)
from searchenginepp_spark.operators.query import search
from searchenginepp_spark.sources.corpus import synthesize_corpus

# ---------------------------------------------------------- decision logic


def test_explicit_requests_pass_through(spark):
    assert resolve_cache_postings(spark, True, None)[0] == "memory"
    assert resolve_cache_postings(spark, False, None)[0] is False
    assert resolve_cache_postings(spark, "disk", None)[0] == "disk"
    with pytest.raises(ValueError):
        resolve_cache_postings(spark, "bogus", None)


def test_auto_without_file_provenance_keeps_memory(spark):
    mode, meta = resolve_cache_postings(spark, "auto", [])
    assert mode == "memory"
    assert "no estimate basis" in meta["decision"]


def test_auto_flips_to_disk_under_pressure(spark, monkeypatch):
    # estimate: input × (1.4 + 0.6) vs 0.6 × storage — 1 GB of input against
    # 1 GB of storage must flip; against 100 GB must not
    monkeypatch.setattr(ib, "_files_nbytes", lambda s, f: 1 << 30)
    monkeypatch.setattr(ib, "_executor_storage_info",
                        lambda s: (1 << 30, 1 << 30))
    mode, meta = resolve_cache_postings(spark, "auto", ["x.parquet"])
    assert mode == "disk"
    assert meta["est_cache_bytes"] > meta["cache_budget_bytes"]
    monkeypatch.setattr(ib, "_executor_storage_info",
                        lambda s: (100 << 30, 100 << 30))
    mode, _ = resolve_cache_postings(spark, "auto", ["x.parquet"])
    assert mode == "memory"


def test_auto_build_records_decision_and_disk_parity(spark, tmp_path_factory,
                                                     monkeypatch):
    """Force the pressure path on a real file-backed corpus: the manifest
    must record the disk decision and the index must equal the memory-mode
    build exactly (persist level is invisible to results)."""
    src = str(tmp_path_factory.mktemp("cp_corpus") / "corpus")
    synthesize_corpus(spark, 300).repartition(4).write.parquet(src)
    corpus = spark.read.parquet(src)

    a = str(tmp_path_factory.mktemp("cp_mem"))
    build_index(spark, corpus, a, salt_target=64, block_size=16,
                cache_postings=True)

    monkeypatch.setattr(ib, "_executor_storage_info", lambda s: (1024, 1024))
    b = str(tmp_path_factory.mktemp("cp_disk"))
    build_index(spark, corpus, b, salt_target=64, block_size=16,
                cache_postings="auto")
    manifest = json.load(open(f"{b}/manifest/build_manifest.json"))
    assert manifest["cache_postings"] == "disk"
    assert "disk" in manifest["cache_decision"]["decision"]

    dm_a = sorted(map(tuple, spark.read.parquet(f"{a}/docmap").collect()))
    dm_b = sorted(map(tuple, spark.read.parquet(f"{b}/docmap").collect()))
    assert dm_a == dm_b
    q = [(1, "int return sym1"), (2, "twinkle wonder")]
    ra = sorted(map(tuple, search(spark, a, q, k=10).collect()))
    rb = sorted(map(tuple, search(spark, b, q, k=10).collect()))
    assert ra == rb


# ------------------------------------------------------------- doclen_jvm

_ADVERSARIAL_DOCS = [
    "int return;; the quick brown fox",          # stopwords + punctuation
    "",                                          # empty
    None,                                        # null content
    "x" * 300,                                   # single token over the cap
    ("tok " * 5) + ("y" * 241),                  # cap boundary: 241 drops
    ("tok " * 5) + ("y" * 240),                  # 240 survives
    "a\u00a0b\u2003c \u2028d",               # exotic whitespace: NOT a
                                                 # separator (C-locale set)
    "UPPER Case MiXeD the AND",                  # lowercase + stopword after
    "foo«bar»baz“qux”",                          # multi-byte punctuation
    "ΣΟΦΟΣ ΣΟΦΟΣ word",                          # final-sigma lowercasing
    " \t\n leading and trailing \r\x0b\x0c ",
    "don't a->b /*comment*/ x=y+1;",
]


def test_doclen_jvm_matches_udf_on_adversarial_docs(spark):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(_ADVERSARIAL_DOCS)],
        "docid long, content string")
    got = {r["docid"]: r["doclen"]
           for r in doclen_jvm(df).collect()}
    want = {r["docid"]: r["doclen"]
            for r in df.withColumn("doclen",
                                   doclen_udf(stem=False)(F.col("content")))
            .select("docid", "doclen").collect()}
    # doclen_jvm omits zero-token docs (callers coalesce on join); compare
    # with that contract applied
    want_nonzero = {k: v for k, v in want.items() if v > 0}
    assert got == want_nonzero
    # and stemming must not change doclen (1:1 post-filter mapping)
    want_stem = {r["docid"]: r["doclen"]
                 for r in df.withColumn("doclen",
                                        doclen_udf(stem=True)(F.col("content")))
                 .select("docid", "doclen").collect()}
    assert want_stem == want


def test_doclen_jvm_matches_udf_on_synthetic_corpus(spark):
    corpus = synthesize_corpus(spark, 200).withColumn(
        "docid", F.monotonically_increasing_id())
    got = {r["docid"]: r["doclen"] for r in doclen_jvm(corpus).collect()}
    want = {r["docid"]: r["doclen"]
            for r in corpus.withColumn(
                "doclen", doclen_udf(stem=False)(F.col("content")))
            .select("docid", "doclen").collect()}
    assert got == {k: v for k, v in want.items() if v > 0}
    assert len(got) == 200          # every synthetic doc has tokens
