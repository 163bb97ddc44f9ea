"""Ranking-quality evaluation — mAP / nDCG@k / MRR over a qrels table.

The reference evaluates its run files with trec_eval against MS MARCO
qrels and publishes mAP 0.1982 / RR 0.8110 (reference report.pdf §3.1,
run via /root/reference/README.md's trec_eval invocation).  Neither
trec_eval nor MS MARCO ships in this environment, so the harness computes
the same metrics natively — as DataFrame window/agg expressions, so a
billion-query evaluation would distribute like any other plan — and the
tests pin them on a synthetic qrels fixture to catch scorer drift
(tests/test_evaluation.py: BM25 must beat TFIDF, and both must match
golden values to 6 decimals across rounds).

Inputs:
  results  (qid, docid, rank)            — a top-k run (rank 1-based)
  qrels    (qid, docid, gain)            — graded relevance, gain > 0
Metrics per query, then macro-averaged:
  AP       Σ_{hits} precision@rank / n_relevant   (binary: gain > 0)
  nDCG@k   Σ gain/log2(rank+1) over top-k, normalized by the ideal DCG
  RR       1 / rank of the first relevant hit
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def evaluate_topk(results: DataFrame, qrels: DataFrame,
                  k: int = 10) -> DataFrame:
    """Per-query (qid, ap, ndcg, rr, n_relevant) — one join + windows, no
    driver-side loops (qrels may be arbitrarily large)."""
    run = results.select("qid", "docid", "rank").filter(F.col("rank") <= k)
    judged = run.join(qrels.select("qid", "docid", "gain"),
                      ["qid", "docid"], "left").withColumn(
        "gain", F.coalesce(F.col("gain"), F.lit(0.0)).cast("double")
    ).withColumn("hit", (F.col("gain") > 0).cast("double"))

    w = (Window.partitionBy("qid").orderBy("rank")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    judged = judged.withColumn("cum_hits", F.sum("hit").over(w)).withColumn(
        "prec_at", F.col("cum_hits") / F.col("rank"))

    per_q = judged.groupBy("qid").agg(
        F.sum(F.col("hit") * F.col("prec_at")).alias("sum_prec"),
        F.sum(F.col("gain") / F.log2(F.col("rank") + 1)).alias("dcg"),
        F.max(F.when(F.col("hit") > 0, 1.0 / F.col("rank"))).alias("rr"),
    )

    # ideal DCG + relevant count from qrels alone (covers relevant docs the
    # run missed entirely — they still lower AP/nDCG)
    wq = Window.partitionBy("qid").orderBy(F.desc("gain"), F.asc("docid"))
    ideal = (
        qrels.filter(F.col("gain") > 0)
        .withColumn("irank", F.row_number().over(wq))
        .groupBy("qid").agg(
            F.count("*").alias("n_relevant"),
            F.sum(F.when(F.col("irank") <= k,
                         F.col("gain") / F.log2(F.col("irank") + 1))
                  .otherwise(0.0)).alias("idcg"),
        )
    )
    return (
        ideal.join(per_q, "qid", "left")
        .select(
            "qid",
            F.round(F.coalesce(F.col("sum_prec"), F.lit(0.0))
                    / F.col("n_relevant"), 6).alias("ap"),
            F.round(F.coalesce(F.col("dcg"), F.lit(0.0))
                    / F.col("idcg"), 6).alias("ndcg"),
            F.round(F.coalesce(F.col("rr"), F.lit(0.0)), 6).alias("rr"),
            "n_relevant",
        )
    )


def mean_metrics(results: DataFrame, qrels: DataFrame, k: int = 10) -> dict:
    """Macro-averaged {'map', 'ndcg', 'mrr', 'n_queries'} (the reference
    report's summary row, computed over every qid present in qrels)."""
    row = evaluate_topk(results, qrels, k=k).agg(
        F.round(F.avg("ap"), 6).alias("map"),
        F.round(F.avg("ndcg"), 6).alias("ndcg"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.count("*").alias("n_queries"),
    ).collect()[0]
    return {"map": row["map"], "ndcg": row["ndcg"], "mrr": row["mrr"],
            "n_queries": int(row["n_queries"])}
