"""Ranking-quality harness: known-answer metric math + a synthetic qrels
fixture that pins BM25/TFIDF quality across rounds (scorer drift breaks the
goldens; reference report.pdf §3.1 table is the model)."""

import pytest

from searchenginepp_spark.operators.evaluation import evaluate_topk, mean_metrics
from searchenginepp_spark.operators.query import search_corpus


def test_metric_known_answers(spark):
    # run: rank1=doc2 (rel), rank2=doc3 (not), rank3=doc1 (rel)
    results = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 2), (1, 1, 3)], "qid long, docid long, rank long")
    qrels = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 1.0)], "qid long, docid long, gain double")
    row = evaluate_topk(results, qrels, k=10).collect()[0]
    assert row["ap"] == pytest.approx((1.0 + 2 / 3) / 2, abs=1e-6)
    assert row["rr"] == 1.0
    assert row["ndcg"] == pytest.approx(1.5 / (1.0 + 0.63093), abs=1e-4)
    assert row["n_relevant"] == 2
    # every rank/irank ≤ 20, so the cut-20 variant equals ndcg here
    assert row["ndcg_20"] == row["ndcg"]
    assert row["set_p"] == pytest.approx(2 / 3, abs=1e-6)
    assert row["set_r"] == 1.0
    assert row["set_f"] == pytest.approx(0.8, abs=1e-6)  # 2PR/(P+R)


def test_ndcg_cut_deeper_than_run_raises(spark):
    # ADVICE round 3: a cut-20 nDCG of a depth-10 run understates standard
    # nDCG@20 — the mismatch must surface at call time, and the default
    # second cut must follow the run depth (min(k, 20))
    results = spark.createDataFrame([(1, 2, 1)], "qid long, docid long, rank long")
    qrels = spark.createDataFrame([(1, 2, 1.0)], "qid long, docid long, gain double")
    with pytest.raises(ValueError, match="run depth"):
        evaluate_topk(results, qrels, k=10, ndcg_cut2=20)
    row = evaluate_topk(results, qrels, k=10).collect()[0]  # default: cut 10
    assert row["ndcg_20"] == row["ndcg"]


def test_unretrieved_relevant_lowers_ap(spark):
    results = spark.createDataFrame([(1, 2, 1)], "qid long, docid long, rank long")
    qrels = spark.createDataFrame(
        [(1, 2, 1.0), (1, 99, 1.0)], "qid long, docid long, gain double")
    row = evaluate_topk(results, qrels).collect()[0]
    assert row["ap"] == pytest.approx(0.5, abs=1e-6)


def test_query_with_no_hits_scores_zero(spark):
    results = spark.createDataFrame([(1, 5, 1)], "qid long, docid long, rank long")
    qrels = spark.createDataFrame(
        [(1, 7, 1.0), (2, 8, 1.0)], "qid long, docid long, gain double")
    rows = {r["qid"]: r for r in evaluate_topk(results, qrels).collect()}
    assert rows[1]["ap"] == 0.0 and rows[1]["rr"] == 0.0
    assert rows[2]["ap"] == 0.0       # qid absent from the run entirely


# ---------------------------------------------------------------- fixture

def _relevance_corpus(spark):
    """3 topics; per topic: short relevant docs (high tf), one relevant doc
    WITHOUT the topic term (never retrievable — caps AP below 1), and long
    spam docs mentioning the term once (length normalization separates the
    scorers: BM25 demotes them, TFIDF cannot)."""
    filler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
    rows, qrels = [], []
    topics = {1: "alphax", 2: "betax", 3: "gammax"}
    docid = 0
    for qid, term in topics.items():
        # spam first (lower docids → ties break toward spam, punishing
        # scorers that can't separate them)
        for _ in range(2):
            docid += 1
            rows.append((docid, f"{term} " + filler * 12))
        for tf in (4, 3, 2, 1):
            docid += 1
            rows.append((docid, (f"{term} " * tf) + filler))
            qrels.append((qid, docid, 1.0))
        docid += 1
        rows.append((docid, "unrelated but judged relevant " + filler))
        qrels.append((qid, docid, 1.0))
        for _ in range(3):
            docid += 1
            rows.append((docid, filler * 3))
    docs = spark.createDataFrame(rows, "docid long, content string")
    qrels_df = spark.createDataFrame(qrels, "qid long, docid long, gain double")
    queries = [(qid, term) for qid, term in topics.items()]
    return docs, qrels_df, queries


GOLDEN = {
    # pinned macro metrics — recompute ONLY on a deliberate scorer change
    "bm25": {"map": 0.8, "ndcg": 0.868795, "ndcg_20": 0.868795, "mrr": 1.0,
             "set_p": 0.666667, "set_r": 0.8, "set_f": 0.727273},
    "tfidf": {"map": 0.733333, "ndcg": 0.843538, "ndcg_20": 0.843538,
              "mrr": 1.0, "set_p": 0.666667, "set_r": 0.8,
              "set_f": 0.727273},
}


@pytest.mark.parametrize("scorer", ["bm25", "tfidf"])
def test_scorer_quality_golden(spark, scorer):
    docs, qrels, queries = _relevance_corpus(spark)
    run = search_corpus(spark, docs, queries, k=10, scorer=scorer, stem=False)
    got = mean_metrics(run, qrels, k=10)
    want = GOLDEN[scorer]
    for m in ("map", "ndcg", "ndcg_20", "mrr", "set_p", "set_r", "set_f"):
        assert got[m] == pytest.approx(want[m], abs=1e-6), (m, got)
    assert got["n_queries"] == 3


def test_bm25_beats_tfidf_on_length_spam(spark):
    docs, qrels, queries = _relevance_corpus(spark)
    bm25 = mean_metrics(
        search_corpus(spark, docs, queries, k=10, scorer="bm25", stem=False),
        qrels)
    tfidf = mean_metrics(
        search_corpus(spark, docs, queries, k=10, scorer="tfidf", stem=False),
        qrels)
    assert bm25["map"] > tfidf["map"]
    assert bm25["ndcg"] > tfidf["ndcg"]
