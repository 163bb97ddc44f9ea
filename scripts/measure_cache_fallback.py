#!/usr/bin/env python
"""Measure the cache-pressure auto-fallback at the configuration that
exposed the pathology (VERDICT round 4 #1): 2M docs on ONE 4 GB executor
(local-cluster[1,1,4096], pinned to 2 CPUs — 1 executor core + 1 driver),
identical input parquet, alternating runs of

  memory  cache_postings=True   (the old default: MEMORY_AND_DISK persists
                                 — spills/evicts at this size, measured
                                 967 s docmap in round 4)
  auto    cache_postings="auto"  (round 5: the estimator must flip BOTH
                                 persists to DISK_ONLY before the build)

Partitioning matters for WHICH failure memory mode hits: round 4's run
used 128 input/shuffle partitions (bench's scaling default) and spilled;
at 32 partitions the cached postings partitions are 4x larger and the
4 GB executor dies outright with JVM OOM (exit code 52, measured
2026-08-17: executors 0 and 1 both lost, job aborted in stage 10.2) —
an even harder failure the auto fallback must avoid.  Default here is
128 to reproduce the round-4 spill pathology as a time-vs-time A/B.

Writes measurements/round5_cache_fallback_2M.json.  Usage:

    python scripts/measure_cache_fallback.py [--docs 2000000] [--runs 2]
        [--parts 128] [--corpus /path/to/existing/corpus_parquet]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def generate_corpus(n_docs: int, out: str, parts: int) -> float:
    """Synthesize the shared input once, unpinned local[8] (generation is
    not part of the measurement; both modes read these exact bytes)."""
    from bench import make_spark
    from searchenginepp_spark.sources.corpus import (
        synthesize_corpus_distributed,
    )

    t0 = time.perf_counter()
    spark = make_spark(8)
    try:
        spark.sparkContext.setLogLevel("ERROR")
        synthesize_corpus_distributed(
            spark, n_docs, num_partitions=parts).write.mode(
            "overwrite").parquet(out)
    finally:
        spark.stop()
    return time.perf_counter() - t0


def one_run(mode: str, n_docs: int, workdir: str, corpus_src: str,
            parts: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CACHE_MODE=mode,
               SPARK_GRAFT_CORPUS_SRC=corpus_src,
               SPARK_GRAFT_SCALING_PARTS=str(parts))
    cmd = [sys.executable, f"{REPO}/bench.py",
           "--one-run", "executor", "1", str(n_docs), workdir]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", "0-1"] + cmd
    log = f"{workdir}_stderr.log"
    with open(log, "w") as ef:
        out = subprocess.run(cmd, stdout=subprocess.PIPE, stderr=ef,
                             text=True, timeout=5400, env=env)
    last = [ln for ln in out.stdout.strip().split("\n")
            if ln.startswith("{")]
    if out.returncode != 0 or not last:
        tail = open(log).read()[-6000:]
        raise RuntimeError(f"run failed rc={out.returncode} "
                           f"(full log: {log}) stderr tail: {tail}")
    return json.loads(last[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--modes", default="memory,auto")
    ap.add_argument("--parts", type=int, default=128)
    ap.add_argument("--corpus", default="",
                    help="reuse an existing corpus parquet (must have been "
                         "generated with the same --docs and --parts)")
    ap.add_argument("--out", default="round5_cache_fallback_2M.json",
                    help="output file name under measurements/ (so the "
                         "32-partition hard-failure pair does not clobber "
                         "the 128-partition spill A/B)")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="sepp_cachefb_")
    modes = args.modes.split(",")
    results: dict = {m: [] for m in modes}
    try:
        if args.corpus and os.path.exists(args.corpus):
            corpus_src = args.corpus
            print(f"reusing corpus {corpus_src}", flush=True)
        else:
            corpus_src = f"{tmp}/corpus_parquet"
            gen_s = generate_corpus(args.docs, corpus_src, args.parts)
            print(f"corpus generated in {gen_s:.1f}s -> {corpus_src}",
                  flush=True)
        errors = []
        for i in range(args.runs):              # alternate modes per round
            for m in modes:
                wd = f"{tmp}/{m}_{i}"
                t0 = time.perf_counter()
                try:
                    r = one_run(m, args.docs, wd, corpus_src, args.parts)
                except Exception as exc:        # keep the other runs
                    errors.append(f"{m} run {i}: {str(exc)[:2000]}")
                    print(f"[{m} run {i}] FAILED: {exc}", flush=True)
                    shutil.rmtree(wd, ignore_errors=True)
                    continue
                r["wall_s"] = round(time.perf_counter() - t0, 1)
                results[m].append(r)
                print(f"[{m} run {i}] build {r['build_s']:.1f}s "
                      f"phases={r['phases']} "
                      f"decision={r.get('cache_postings')}", flush=True)
                shutil.rmtree(wd, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    summary = {
        "config": f"local-cluster[1,1,4096] 4g executor, pinned 0-1, "
                  f"{args.parts} partitions, shared input parquet",
        "n_docs": args.docs, "n_runs": args.runs,
        "runs": results,
        **({"run_errors": errors} if errors else {}),
    }
    bests = {}
    for m in modes:
        if results[m]:
            bests[m] = min(r["build_s"] for r in results[m])
            summary[f"best_build_s_{m}"] = round(bests[m], 2)
    if "memory" in bests and "auto" in bests:
        summary["auto_speedup_vs_memory"] = round(
            bests["memory"] / bests["auto"], 3)
    os.makedirs(f"{REPO}/measurements", exist_ok=True)
    out_path = f"{REPO}/measurements/{args.out}"
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "runs"}))
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
