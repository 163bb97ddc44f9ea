#!/usr/bin/env python
"""Benchmark: index-build throughput + query latency + N→4N scaling.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-phase / per-query sec...}, "sf": ...,
   "docs_per_sec": ..., "scaling": {...}, "cpu": {...}}

Environment:
  SPARK_GRAFT_SF_DIR       testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS         parallelism of the headline run (default 8 — see
                           `cpu` in the output: this host advertises 32
                           hyperthreads but delivers ~8-10 cores of real
                           throughput; >8 Spark threads + >8 Python workers
                           just thrash)
  SPARK_GRAFT_BENCH_DOCS   synthetic corpus size for the headline build
                           (default 100000)
  SPARK_GRAFT_SCALING      "0" to skip the N vs 4N scaling runs (default on)
  SPARK_GRAFT_SCALING_DOCS corpus size for the scaling pair (default 500000
                           — large enough that per-job fixed overhead stops
                           dominating)

Scaling evidence (BASELINE.md / north rule): the same build at local[N] and
local[4N] on identical input; efficiency = T_N / (4 * T_4N).  N=2 by
default so that 4N=8 stays within the host's real core budget; the `cpu`
section reports a measured multiprocessing speedup curve as evidence of
that budget.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "500000"))

BENCH_QUERIES = [
    (1, "sym1 sym2 fn_3"),
    (2, "int return"),            # head terms
    (3, "twinkle wonder world"),
    (4, "sym10 sym20 sym30 sym40"),
    (5, "fn_100 static const"),
]


def make_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"sepp-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.default.parallelism", str(cores))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        # generous heap: with N concurrent parquet writers in ONE local JVM
        # the parquet MemoryManager shrinks row groups when the pool is
        # tight, which poisons every downstream scan (measured 4-6x)
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def cpu_probe() -> dict:
    """Measured parallel speedup of pure-Python work — evidence of the
    host's REAL core budget (hyperthreads/steal time make nproc a lie)."""
    total = 16_000_000
    t1 = time.perf_counter()
    _burn(total)
    t1 = time.perf_counter() - t1
    out = {"nproc": mp.cpu_count(), "speedup": {}}
    for procs in (8, 32):
        per = total // procs
        t0 = time.perf_counter()
        with mp.Pool(procs) as p:
            p.map(_burn, [per] * procs)
        out["speedup"][str(procs)] = round(t1 / (time.perf_counter() - t0), 1)
    return out


def run_build(cores: int, n_docs: int, workdir: str,
              run_queries: bool = True) -> dict:
    from searchenginepp_spark.operators.index_build import build_index
    from searchenginepp_spark.sources.corpus import synthesize_corpus_distributed

    spark = make_spark(cores)
    try:
        spark.sparkContext.setLogLevel("ERROR")
        corpus = synthesize_corpus_distributed(spark, n_docs,
                                               num_partitions=max(cores * 2, 16))
        # materialize input first so generation cost is excluded from build
        src = f"{workdir}/corpus_parquet"
        corpus.write.mode("overwrite").parquet(src)
        corpus = spark.read.parquet(src)

        t0 = time.perf_counter()
        paths = build_index(spark, corpus, f"{workdir}/index",
                            term_partitions=max(cores * 2, 8))
        build_s = time.perf_counter() - t0
        res = {"build_s": build_s, "docs_per_sec": n_docs / build_s}
        if not run_queries:
            return res

        from searchenginepp_spark.operators.index_build import index_size_report

        res["index_size"] = index_size_report(spark, paths)

        from searchenginepp_spark.operators.bmm import search_bmm
        from searchenginepp_spark.operators.query import Searcher

        searcher = Searcher(spark, f"{workdir}/index")
        qt = {}
        t0 = time.perf_counter()
        for qid, text in BENCH_QUERIES:
            tq = time.perf_counter()
            searcher.search([(qid, text)], k=10).collect()
            qt[f"q{qid}"] = round(time.perf_counter() - tq, 3)
        res["query_s"] = time.perf_counter() - t0
        # one batched call over all queries (amortized throughput) and the
        # block-max pruned path
        tq = time.perf_counter()
        searcher.search(BENCH_QUERIES, k=10).collect()
        qt["batch_exact"] = round(time.perf_counter() - tq, 3)
        tq = time.perf_counter()
        search_bmm(spark, f"{workdir}/index", BENCH_QUERIES, k=10).collect()
        qt["batch_bmm"] = round(time.perf_counter() - tq, 3)

        # in-process serving reader (no Spark job per query) — the latency
        # figure comparable to the reference engine's ms-scale numbers
        from searchenginepp_spark.operators.local_engine import LocalSearcher

        ls = LocalSearcher(f"{workdir}/index")
        t0 = time.perf_counter()
        for q in BENCH_QUERIES:                  # cold: parquet reads
            ls.search([q], k=10)
        qt["local_cold_avg_ms"] = round(
            (time.perf_counter() - t0) / len(BENCH_QUERIES) * 1000, 2)
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):                    # warm: cursor cache hits
            for q in BENCH_QUERIES:
                ls.search([q], k=10)
        qt["local_warm_avg_ms"] = round(
            (time.perf_counter() - t0) / (reps * len(BENCH_QUERIES)) * 1000, 2)
        res["per_query"] = qt
        return res
    finally:
        spark.stop()


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="sepp_bench_")
    try:
        big = run_build(CPUS, N_DOCS, f"{tmp}/big")
        scaling = None
        if DO_SCALING:
            lo = run_build(2, SCALING_DOCS, f"{tmp}/lo", run_queries=False)
            hi = run_build(8, SCALING_DOCS, f"{tmp}/hi", run_queries=False)
            scaling = {
                "cores_n": 2, "cores_4n": 8, "n_docs": SCALING_DOCS,
                "build_s_n": round(lo["build_s"], 2),
                "build_s_4n": round(hi["build_s"], 2),
                "docs_per_sec_n": round(lo["docs_per_sec"], 1),
                "docs_per_sec_4n": round(hi["docs_per_sec"], 1),
                "efficiency": round(lo["build_s"] / (4 * hi["build_s"]), 3),
            }
        queries = {"build": round(big["build_s"], 3),
                   "query_batch": round(big.get("query_s", 0.0), 3)}
        queries.update(big.get("per_query", {}))
        out = {
            "metric": "index-build+query wall clock "
                      f"({N_DOCS} synthetic docs, local[{CPUS}])",
            "value": round(big["build_s"] + big.get("query_s", 0.0), 3),
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "docs_per_sec": round(big["docs_per_sec"], 1),
            "n_docs": N_DOCS,
            "scaling": scaling,
            "index_size": big.get("index_size"),
            "cpu": cpu_probe(),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
