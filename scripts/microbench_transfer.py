#!/usr/bin/env python
"""A/B the encode transfer mode (row vs dict) on the full build path.

Alternating fresh-JVM runs (CLAUDE.md protocol: single shots are noise on
this host); prints per-run phase timings and the min-per-mode summary.

  python scripts/microbench_transfer.py [n_docs] [cores] [runs_per_mode]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def one_run(mode: str, n_docs: int, cores: int, workdir: str) -> dict:
    from pyspark.sql import SparkSession

    from searchenginepp_spark.operators.index_build import build_index
    from searchenginepp_spark.sources.corpus import (
        synthesize_corpus_distributed,
    )

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"transfer-ab-{mode}")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.shuffle.partitions", str(cores * 4))
        .config("spark.default.parallelism", str(cores * 3))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .getOrCreate()
    )
    try:
        spark.sparkContext.setLogLevel("ERROR")
        src = f"{workdir}/corpus"
        if not os.path.exists(src):
            (synthesize_corpus_distributed(spark, n_docs,
                                           num_partitions=cores * 3)
             .write.mode("overwrite").parquet(src))
        corpus = spark.read.parquet(src)
        phases: dict = {}
        t0 = time.perf_counter()
        build_index(spark, corpus, f"{workdir}/idx_{mode}", timings=phases,
                    transfer=mode)
        total = time.perf_counter() - t0
        return {"mode": mode, "total_s": round(total, 2),
                "phases": {k: round(v, 2) for k, v in phases.items()}}
    finally:
        spark.stop()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    workdir = tempfile.mkdtemp(prefix="sepp_transfer_ab_")
    results: dict[str, list[dict]] = {"row": [], "dict": []}
    try:
        for i in range(runs):
            for mode in ("row", "dict"):
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--one", mode, str(n_docs), str(cores), workdir]
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     timeout=3600)
                lines = [ln for ln in out.stdout.splitlines()
                         if ln.startswith("{")]
                if out.returncode != 0 or not lines:
                    print(f"run failed ({mode}): {out.stderr[-400:]}",
                          file=sys.stderr)
                    continue
                r = json.loads(lines[-1])
                results[mode].append(r)
                print(json.dumps(r), flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    summary = {}
    for mode, rs in results.items():
        if rs:
            best = min(rs, key=lambda r: r["total_s"])
            summary[mode] = {"n": len(rs), "best_total_s": best["total_s"],
                             "best_phases": best["phases"],
                             "min_encode_s": min(r["phases"].get("encode", 0)
                                                 for r in rs)}
    print(json.dumps({"n_docs": n_docs, "cores": cores, "summary": summary}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        print(json.dumps(one_run(sys.argv[2], int(sys.argv[3]),
                                 int(sys.argv[4]), sys.argv[5])))
    else:
        main()
