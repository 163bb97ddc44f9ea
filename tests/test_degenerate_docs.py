"""Degenerate-document robustness: empty, punctuation-only, and
stopword-only docs must be ingested (docmap keeps every doc, doclen 0 —
reference document index does the same, IndexBuilder.cpp:74-98) without
breaking the build, the stats, or any query path."""

import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.bmm import search_bmm
from searchenginepp_spark.operators.index_build import build_index
from searchenginepp_spark.operators.local_engine import LocalSearcher
from searchenginepp_spark.operators.query import search


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rows = [
        ("r/a", "empty.c", "c1", "c", ""),
        ("r/a", "punct.c", "c2", "c", "!!! ,,, ... ;;; ("),
        ("r/a", "stop.c", "c3", "c", "the and of to a"),
        ("r/a", "one.c", "c4", "c", "solitaryterm"),
        ("r/b", "norm1.c", "c5", "c", "alpha beta gamma alpha"),
        ("r/b", "norm2.c", "c6", "c", "beta gamma delta beta beta"),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    root = str(tmp_path_factory.mktemp("degen"))
    build_index(spark, corpus, root, salt_target=64, block_size=4)
    return root


def test_docmap_keeps_all_docs(spark, built):
    docmap = spark.read.parquet(f"{built}/docmap")
    assert docmap.count() == 6
    by_path = {r["path"]: r["doclen"] for r in docmap.collect()}
    assert by_path["empty.c"] == 0
    assert by_path["punct.c"] == 0
    assert by_path["stop.c"] == 0
    assert by_path["one.c"] == 1
    stats = spark.read.parquet(f"{built}/stats").collect()[0]
    assert stats["n_docs"] == 6
    assert stats["sum_doclen"] == sum(by_path.values())


def test_queries_over_degenerate_index(spark, built):
    res = search(spark, built, [(1, "alpha beta"), (2, "solitaryterm")], k=10)
    rows = {(r["qid"], r["docno"].split(":")[1].split("@")[0]) for r in res.collect()}
    assert (2, "one.c") in rows
    assert any(q == 1 for q, _ in rows)

    bmm = search_bmm(spark, built, [(1, "alpha beta")], k=10)
    assert bmm.count() == res.filter(F.col("qid") == 1).count()

    ls = LocalSearcher(built)
    local = ls.search([(1, "alpha beta"), (2, "solitaryterm")], k=10)
    assert len(local) == len(rows)
