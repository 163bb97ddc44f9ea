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
                           hyperthreads but delivers fewer real cores;
                           >8 Spark threads + >8 Python workers thrash)
  SPARK_GRAFT_BENCH_DOCS   synthetic corpus size for the headline build
                           (default 100000)
  SPARK_GRAFT_SCALING      "0" to skip the N vs 4N scaling runs (default on)
  SPARK_GRAFT_SCALING_DOCS corpus size for the scaling pair (default
                           500,000 — see BASELINE.md round-2 analysis:
                           larger corpora do NOT improve measured wall
                           efficiency on this host because the limiter is
                           single-box co-residency overhead, not fixed
                           floor; 500k keeps the min-of-3 protocol cheap)
  SPARK_GRAFT_SCALING_RUNS min-of-N alternating runs per config (default 3
                           — CLAUDE.md protocol: 2-4x host noise)

Scaling evidence (BASELINE.md / north rule): the same build at local[N] and
local[4N] on identical input; efficiency = T_N / (4 * T_4N).  Methodology:

  * Each scaling run executes in its OWN SUBPROCESS pinned with
    `taskset -c` to exactly N (resp. 4N) CPUs.  local[N] alone limits only
    Spark task slots — JVM shuffle/GC/IO threads and Python workers of the
    "small cluster" would otherwise overflow onto idle host cores and
    inflate the small config.  Pinning makes each run a faithful
    N-core-cluster simulation, and gives every run a fresh JVM (driver
    memory and GC state cannot leak between configs).
  * Runs alternate lo/hi (min-of-N per config) so slow-host windows hit
    both configs equally.
  * Per-phase wall times (docids/docmap/sample/encode/lexicon) AND total
    host CPU-seconds consumed (/proc/stat around each run) are recorded
    for both configs.  cpu_s attribution separates ALGORITHMIC
    serialization (would show as idle cores at 4N) from single-JVM
    co-residency overhead (shows as MORE cpu_s burned at 4N for the same
    work — GC/allocator/worker-density effects a real 4N-EXECUTOR cluster
    does not have, because each executor keeps constant thread density).
    work_scaling_efficiency = cpu_s_n / cpu_s_4n is the
    executor-scale-out-relevant number; wall efficiency is the single-box
    number.
  * The `cpu` section reports the host's measured multiprocessing speedup
    curve (min-of-3): nproc lies on this box; the curve is the ceiling any
    wall-clock scaling number can reach.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "500000"))
SCALING_RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
SCALING_N = 2

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
        # 3-4 tasks per core: stragglers amortize, cache partitions stay
        # balanced (1 task/core measured ~10% slower at 8 cores)
        .config("spark.sql.shuffle.partitions", str(max(cores * 4, 8)))
        .config("spark.default.parallelism", str(cores * 3))
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
    """Measured parallel speedup of pure-Python work (min-of-3) — evidence
    of the host's REAL core budget (hyperthreads/steal make nproc a lie)."""
    total = 16_000_000
    t1 = time.perf_counter()
    _burn(total)
    t1 = time.perf_counter() - t1
    out = {"nproc": mp.cpu_count(), "speedup": {}}
    for procs in (2, 8, 32):
        per = total // procs
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            with mp.Pool(procs) as p:
                p.map(_burn, [per] * procs)
            d = time.perf_counter() - t0
            best = d if best is None or d < best else best
        out["speedup"][str(procs)] = round(t1 / best, 2)
    return out


def run_build(cores: int, n_docs: int, workdir: str,
              run_queries: bool = True) -> dict:
    from searchenginepp_spark.operators.index_build import build_index
    from searchenginepp_spark.sources.corpus import synthesize_corpus_distributed

    spark = make_spark(cores)
    try:
        spark.sparkContext.setLogLevel("ERROR")
        corpus = synthesize_corpus_distributed(spark, n_docs,
                                               num_partitions=max(cores * 3, 16))
        # materialize input first so generation cost is excluded from build
        src = f"{workdir}/corpus_parquet"
        corpus.write.mode("overwrite").parquet(src)
        corpus = spark.read.parquet(src)

        phases: dict = {}
        busy0, _ = _cpu_stat()
        t0 = time.perf_counter()
        # term_partitions left to the library's data-based sizing
        # (~5M postings/partition — 2M docs would spill at cores*2)
        paths = build_index(spark, corpus, f"{workdir}/index",
                            timings=phases)
        build_s = time.perf_counter() - t0
        busy1, _ = _cpu_stat()
        res = {"build_s": build_s, "docs_per_sec": n_docs / build_s,
               "phases": phases, "cpu_s": round(busy1 - busy0, 1)}
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
        # one batched call over all queries (amortized throughput), the
        # block-max pruned path, and the two-level fan-out plan shape
        tq = time.perf_counter()
        searcher.search(BENCH_QUERIES, k=10).collect()
        qt["batch_exact"] = round(time.perf_counter() - tq, 3)
        tq = time.perf_counter()
        search_bmm(spark, f"{workdir}/index", BENCH_QUERIES, k=10).collect()
        qt["batch_bmm"] = round(time.perf_counter() - tq, 3)
        tq = time.perf_counter()
        search_bmm(spark, f"{workdir}/index", BENCH_QUERIES, k=10,
                   n_ranges=4).collect()
        qt["batch_bmm_2level"] = round(time.perf_counter() - tq, 3)

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


def _cpu_stat() -> tuple[float, float]:
    """(busy_cpu_seconds, iowait_seconds) system-wide from /proc/stat."""
    try:
        with open("/proc/stat") as f:
            v = [int(x) for x in f.readline().split()[1:8]]
        return (v[0] + v[1] + v[2]) / 100.0, v[4] / 100.0
    except OSError:
        return 0.0, 0.0


def _scaling_subprocess(cores: int, n_docs: int, workdir: str) -> dict:
    """One pinned scaling run in a fresh interpreter+JVM.  The subprocess
    reports system-wide CPU-seconds bracketing ONLY the build (valid
    because the bench owns the machine while it runs)."""
    cmd = [sys.executable, os.path.abspath(__file__),
           "--scaling-run", str(cores), str(n_docs), workdir]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    last = [ln for ln in out.stdout.strip().split("\n") if ln.startswith("{")]
    if out.returncode != 0 or not last:
        raise RuntimeError(f"scaling run failed: rc={out.returncode} "
                           f"stderr tail: {out.stderr[-500:]}")
    return json.loads(last[-1])


def run_scaling() -> dict | None:
    lo_runs, hi_runs = [], []
    errors = []
    tmp = tempfile.mkdtemp(prefix="sepp_scaling_")
    try:
        for _ in range(SCALING_RUNS):            # alternate lo/hi
            for cores, acc, sub in ((SCALING_N, lo_runs, "lo"),
                                    (SCALING_N * 4, hi_runs, "hi")):
                try:
                    acc.append(_scaling_subprocess(
                        cores, SCALING_DOCS, f"{tmp}/{sub}"))
                except Exception as exc:         # record partial evidence
                    errors.append(f"{cores}c: {exc}"[:300])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    if not lo_runs or not hi_runs:
        return {"error": "scaling runs failed", "details": errors,
                "n_lo": len(lo_runs), "n_hi": len(hi_runs)}
    lo = min(lo_runs, key=lambda r: r["build_s"])
    hi = min(hi_runs, key=lambda r: r["build_s"])
    cpu_lo = min(r["cpu_s"] for r in lo_runs)
    cpu_hi = min(r["cpu_s"] for r in hi_runs)
    return {
        "cores_n": SCALING_N, "cores_4n": SCALING_N * 4,
        "n_docs": SCALING_DOCS, "n_runs": SCALING_RUNS,
        "pinned": bool(shutil.which("taskset")),
        "build_s_n": round(lo["build_s"], 2),
        "build_s_4n": round(hi["build_s"], 2),
        "build_s_n_all": [round(r["build_s"], 2) for r in lo_runs],
        "build_s_4n_all": [round(r["build_s"], 2) for r in hi_runs],
        "docs_per_sec_n": round(lo["docs_per_sec"], 1),
        "docs_per_sec_4n": round(hi["docs_per_sec"], 1),
        "efficiency": round(lo["build_s"] / (4 * hi["build_s"]), 3),
        # same logical work both configs: cpu_s ratio isolates single-JVM
        # co-residency overhead from algorithmic serialization — the
        # executor-scale-out-relevant number (see module docstring)
        "cpu_s_n": cpu_lo, "cpu_s_4n": cpu_hi,
        "work_scaling_efficiency": round(cpu_lo / cpu_hi, 3) if cpu_hi else None,
        "utilization_n": round(cpu_lo / (lo["build_s"] + 1e-9) / SCALING_N, 2),
        "utilization_4n": round(cpu_hi / (hi["build_s"] + 1e-9)
                                / (SCALING_N * 4), 2),
        "phases_n": lo["phases"], "phases_4n": hi["phases"],
        **({"run_errors": errors} if errors else {}),
    }


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="sepp_bench_")
    try:
        big = run_build(CPUS, N_DOCS, f"{tmp}/big")
        scaling = run_scaling() if DO_SCALING else None
        cpu = cpu_probe()
        if scaling is not None and "efficiency" in scaling:
            # the host's SAME-WINDOW delivered parallelism bounds any
            # wall-clock efficiency: ceiling = speedup(4N)/(4*speedup(N));
            # efficiency_vs_host_ceiling reads out how much of the
            # achievable scaling the build actually realizes
            s_n = cpu["speedup"].get(str(SCALING_N))
            s_4n = cpu["speedup"].get(str(SCALING_N * 4))
            if s_n and s_4n:
                ceil = s_4n / (4 * s_n)
                scaling["host_ceiling_efficiency"] = round(ceil, 3)
                scaling["efficiency_vs_host_ceiling"] = round(
                    scaling["efficiency"] / ceil, 3)
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
            "build_phases": big.get("phases"),
            "scaling": scaling,
            "index_size": big.get("index_size"),
            "cpu": cpu,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-run":
        cores, n_docs, workdir = (int(sys.argv[2]), int(sys.argv[3]),
                                  sys.argv[4])
        r = run_build(cores, n_docs, workdir, run_queries=False)
        print(json.dumps({"build_s": r["build_s"],
                          "docs_per_sec": r["docs_per_sec"],
                          "phases": r["phases"], "cpu_s": r["cpu_s"]}))
    else:
        main()
