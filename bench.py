#!/usr/bin/env python
"""Benchmark: index-build throughput + query latency + N→4N scaling.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-phase / per-query sec...}, "sf": ...,
   "docs_per_sec": ..., "scaling": {...}}

Environment:
  SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1) — used
                       for the documents-table query bench
  SPARK_GRAFT_CPUS     parallelism of the big run (default 32)
  SPARK_GRAFT_BENCH_DOCS  synthetic corpus size for the build bench
                       (default 100000 — FIXTURES.md bench size)
  SPARK_GRAFT_SCALING  "0" to skip the second (N-core) run (default on)

Scaling evidence (BASELINE.md): the same build at local[N] and local[4N]
on identical input; efficiency = T_N / (4 * T_4N).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

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


def run_build(cores: int, n_docs: int, workdir: str) -> dict:
    from searchenginepp_spark.operators.index_build import build_index
    from searchenginepp_spark.sources.corpus import synthesize_corpus_distributed

    spark = make_spark(cores)
    try:
        corpus = synthesize_corpus_distributed(spark, n_docs,
                                               num_partitions=cores * 2)
        # materialize input first so generation cost is excluded from build
        src = f"{workdir}/corpus_parquet"
        corpus.write.mode("overwrite").parquet(src)
        corpus = spark.read.parquet(src)

        t0 = time.perf_counter()
        build_index(spark, corpus, f"{workdir}/index",
                    term_partitions=cores * 2)
        build_s = time.perf_counter() - t0

        # query batch over the persisted index
        from searchenginepp_spark.operators.query import search

        qt = {}
        t0 = time.perf_counter()
        for qid, text in BENCH_QUERIES:
            tq = time.perf_counter()
            search(spark, f"{workdir}/index", [(qid, text)], k=10).collect()
            qt[f"q{qid}"] = round(time.perf_counter() - tq, 3)
        query_s = time.perf_counter() - t0
        return {"build_s": build_s, "query_s": query_s, "per_query": qt,
                "docs_per_sec": n_docs / build_s}
    finally:
        spark.stop()


def main() -> None:
    results = {}
    tmp = tempfile.mkdtemp(prefix="sepp_bench_")
    try:
        big = run_build(CPUS, N_DOCS, f"{tmp}/big")
        results.update(big)
        scaling = None
        if DO_SCALING:
            small_cores = max(CPUS // 4, 1)
            small = run_build(small_cores, N_DOCS, f"{tmp}/small")
            scaling = {
                "cores_n": small_cores, "cores_4n": CPUS,
                "build_s_n": round(small["build_s"], 2),
                "build_s_4n": round(big["build_s"], 2),
                "docs_per_sec_n": round(small["docs_per_sec"], 1),
                "docs_per_sec_4n": round(big["docs_per_sec"], 1),
                "efficiency": round(small["build_s"] / (4 * big["build_s"]), 3),
            }
        queries = {"build": round(big["build_s"], 3),
                   "query_batch": round(big["query_s"], 3)}
        queries.update(big["per_query"])
        out = {
            "metric": "index-build+query wall clock "
                      f"({N_DOCS} synthetic docs, local[{CPUS}])",
            "value": round(big["build_s"] + big["query_s"], 3),
            "unit": "sec",
            "queries": queries,
            "sf": SF_DIR,
            "docs_per_sec": round(big["docs_per_sec"], 1),
            "n_docs": N_DOCS,
            "scaling": scaling,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
