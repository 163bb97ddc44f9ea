"""Coverage for the remaining query/source surface: TREC run output (Q14),
corpus loading from both input shapes (B1), driver-side query
normalization parity, and Searcher reuse."""

import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.index_build import build_index
from searchenginepp_spark.operators.query import (
    Searcher, normalize_queries, queries_df, query_terms_local, trec_output,
)
from searchenginepp_spark.sources.corpus import load_corpus, synthesize_corpus

QUERIES = [(1, "sym1 sym2"), (2, "int return")]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("qsurf"))
    build_index(spark, synthesize_corpus(spark, 150), root,
                salt_target=64, block_size=16)
    return root


def test_query_terms_local_matches_udf_path(spark):
    """Driver-side normalization must produce exactly what the distributed
    tokenizer UDF produces (same kernel, same dedup, engine.cpp:88-96)."""
    qs = [(1, "Twinkle, twinkle LITTLE bat!"), (2, "the and of"),
          (3, "running runs RUN run"), (4, "foo(bar); x=y+1;")]
    local = set(query_terms_local(qs, stem=True))
    dist = {(r["qid"], r["term"])
            for r in normalize_queries(queries_df(spark, qs), stem=True).collect()}
    assert local == dist
    assert (3, "run") in local and len([t for q, t in local if q == 3]) == 1


def test_trec_output_format(spark, built):
    s = Searcher(spark, built)
    res = s.search(QUERIES, k=5)
    lines = [r["line"] for r in trec_output(res, run_name="r1").collect()]
    assert len(lines) == res.count()
    qid, q0, docno, rank, score, run = lines[0].split(" ")
    assert q0 == "Q0" and run == "r1"
    assert int(qid) in (1, 2) and int(rank) >= 1 and float(score) > 0
    assert "@" in docno and ":" in docno          # repo:path@commit


def test_searcher_reuse_consistent(spark, built):
    s = Searcher(spark, built)
    a = sorted((r["qid"], r["docid"], r["rank"]) for r in s.search(QUERIES, k=5).collect())
    b = sorted((r["qid"], r["docid"], r["rank"]) for r in s.search(QUERIES, k=5).collect())
    assert a == b and a


def test_load_corpus_native_shape(spark, tmp_path):
    native = synthesize_corpus(spark, 20)
    p = str(tmp_path / "native")
    native.write.parquet(p)
    out = load_corpus(spark, p)
    assert set(out.columns) == {"repo", "path", "commit", "lang", "content"}
    assert out.count() == 20


def test_load_corpus_documents_shape(spark):
    out = load_corpus(spark, "/root/testdata/sf0.001/documents.parquet")
    assert set(out.columns) == {"repo", "path", "commit", "lang", "content"}
    assert out.count() == 500
    # adaptation is deterministic: same docno every load
    a = sorted(r["commit"] for r in out.limit(5).collect())
    b = sorted(r["commit"] for r in load_corpus(
        spark, "/root/testdata/sf0.001/documents.parquet").limit(5).collect())
    assert a == b
