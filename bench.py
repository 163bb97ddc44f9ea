#!/usr/bin/env python
"""Benchmark: index-build throughput + query latency + N→4N scaling.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-phase / per-query sec...}, "sf": ...,
   "docs_per_sec": ..., "scaling": {...}, "scaling_executor": {...},
   "cpu": {...}}

Environment:
  SPARK_GRAFT_SF_DIR       testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS         parallelism of the headline run (default 8 — see
                           `cpu` in the output: this host advertises 32
                           hyperthreads but delivers fewer real cores;
                           >8 Spark threads + >8 Python workers thrash)
  SPARK_GRAFT_BENCH_DOCS   synthetic corpus size for the headline build
                           (default 100000)
  SPARK_GRAFT_BENCH_RUNS   min-of-N alternating-free headline repetitions,
                           each a fresh pinned subprocess/JVM (default 3 —
                           the round-2 single-shot headline recorded a
                           phantom 1.8x "regression" that was host weather)
  SPARK_GRAFT_SCALING      "0" to skip the N vs 4N scaling runs (default on)
  SPARK_GRAFT_SCALING_MODE "executor" (default) | "jvm" | "both" — which
                           scaling evidence to produce (see below; executor
                           mode is the one comparable to the north rule's
                           N→4N multi-executor criterion, and the default
                           keeps the full bench under ~25 min)
  SPARK_GRAFT_SCALING_DOCS corpus size for the scaling pair (default
                           1,000,000 — fixed per-JVM/JIT/startup costs are
                           a measurable share of a 500k 4-executor run;
                           1M amortizes them: measured executor-mode
                           efficiency 0.73 @500k → 0.86 @1M, round 3)
  SPARK_GRAFT_SCALING_RUNS min-of-N alternating runs per config (default 3 —
                           VERDICT round 3 #1: the SHIPPED artifact must
                           carry the min-of-3 protocol, not just the
                           committed measurements/*.json windows)
  SPARK_GRAFT_QBATCH       query-throughput batch size (default 200 — the
                           reference's published q/s numbers are over its
                           200-query test2020 set; 0 disables the block)

Scaling evidence (BASELINE.md / north rule), two modes:

  * single-JVM mode ("jvm", the round-1/2 protocol): the same build at
    local[N] and local[4N], each run in its OWN SUBPROCESS pinned with
    `taskset -c` to exactly N (resp. 4N) CPUs; alternating lo/hi,
    min-of-N; /proc/stat CPU-seconds bracketing each run.  This measures
    the single-box wall-clock curve — which round 2 showed is limited by
    single-JVM co-residency (the 4N config burns 1.4-1.75x more
    CPU-seconds for identical work), NOT by algorithmic serialization.
  * executor mode ("executor", new in round 3 — VERDICT round 2 #2): the
    same build on `local-cluster[N,1,mem]` vs `local-cluster[4N,1,mem]` —
    real separate executor JVMs, ONE core + one Python worker each, so
    per-executor thread density stays CONSTANT from N to 4N — the thing a
    real multi-executor cluster has and a single fat JVM does not.  The
    subprocess is pinned to N+1 / 4N+1 CPUs (one extra for the
    driver+master processes, same allowance in both configs).  Efficiency
    here is the number comparable to the north rule's N→4N executor
    scaling criterion.

  efficiency = T_N / (4 * T_4N) in both modes.
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
BENCH_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"
SCALING_MODE = os.environ.get("SPARK_GRAFT_SCALING_MODE", "executor")
SCALING_DOCS = int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "1000000"))
SCALING_RUNS = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
QBATCH = int(os.environ.get("SPARK_GRAFT_QBATCH", "200"))
# N of the N-vs-4N pair.  Default 1 (1 vs 4 cores): the host delivers
# ~1.95x at 2 procs but only ~6.5x at 8 (cpu probe) — a 2-vs-8 pair is
# PHYSICALLY capped at ~0.72 efficiency on this box no matter how well the
# job scales, while 1-vs-4 has a ~0.92 ceiling and can actually evidence
# the ≥0.8 criterion.  Set SPARK_GRAFT_SCALING_N=2 for the 2-vs-8 pair.
SCALING_N = int(os.environ.get("SPARK_GRAFT_SCALING_N", "1"))

BENCH_QUERIES = [
    (1, "sym1 sym2 fn_3"),
    (2, "int return"),            # head terms
    (3, "twinkle wonder world"),
    (4, "sym10 sym20 sym30 sym40"),
    (5, "fn_100 static const"),
]


def make_query_batch(n: int, seed: int = 13) -> list[tuple[int, str]]:
    """Deterministic n-query workload over the synthetic corpus vocabulary —
    the reference's throughput numbers are q/s over a 200-query set
    (BASELINE.md table 3.2), so the bench measures at a comparable batch
    size instead of the 5-query latency set (whose wall is dominated by the
    ~2 s/job scheduling floor).  Mix mirrors real term-frequency spread:
    rare symbols, mid fn_N, head code tokens, stemmable english."""
    import random

    rng = random.Random(seed)
    head = ["int", "return", "static", "const", "void", "class"]
    english = ["twinkle", "wonder", "world", "little", "use"]
    out = []
    for qid in range(1, n + 1):
        kind = rng.random()
        if kind < 0.4:
            terms = [f"sym{rng.randrange(1000)}"
                     for _ in range(rng.randint(1, 3))]
        elif kind < 0.6:
            terms = [f"fn_{rng.randrange(500)}", f"sym{rng.randrange(1000)}"]
        elif kind < 0.85:
            terms = [rng.choice(head), f"sym{rng.randrange(1000)}"]
        else:
            terms = rng.sample(english, rng.randint(1, 2))
        out.append((qid, " ".join(terms)))
    return out

_REPO = os.path.dirname(os.path.abspath(__file__))


def make_spark(cores: int, executor_style: bool = False,
               fixed_parallelism: int | None = None):
    from pyspark.sql import SparkSession

    if executor_style:
        # local-cluster: real executor JVMs, 1 core + 1 Python worker each —
        # constant per-executor density across cluster sizes.  Needs
        # SPARK_HOME pointed at the pyspark dist and the repo on the
        # executors' PYTHONPATH (they spawn their own Python workers).
        import pyspark

        os.environ.setdefault("SPARK_HOME",
                              os.path.dirname(pyspark.__file__))
        builder = (
            SparkSession.builder.master(f"local-cluster[{cores},1,4096]")
            .appName(f"sepp-bench-exec-{cores}")
            .config("spark.executor.memory", "4g")
            .config("spark.executorEnv.PYTHONPATH", _REPO)
            .config("spark.driver.memory", "8g")
        )
    else:
        builder = (
            SparkSession.builder.master(f"local[{cores}]")
            .appName(f"sepp-bench-{cores}")
            # generous heap: with N concurrent parquet writers in ONE local
            # JVM the parquet MemoryManager shrinks row groups when the pool
            # is tight, which poisons every downstream scan (measured 4-6x)
            .config("spark.driver.memory", "48g")
        )
    # Scaling pairs pass fixed_parallelism so BOTH configs run the SAME
    # partition counts (sized by data, as a real cluster would) — otherwise
    # the larger config runs more partitions and pays more per-partition
    # fixed cost, confounding the N-vs-4N comparison.  The headline uses
    # 3-4 tasks per core (stragglers amortize; 1 task/core measured ~10%
    # slower at 8 cores).
    shuffle_p = fixed_parallelism or max(cores * 4, 8)
    default_p = fixed_parallelism or cores * 3
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_p))
        .config("spark.default.parallelism", str(default_p))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
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
    out = {"nproc": mp.cpu_count(), "speedup": {"1": 1.0}}
    for procs in (2, 4, 8, 32):
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
              run_queries: bool = True, executor_style: bool = False,
              fixed_parallelism: int | None = None) -> dict:
    from searchenginepp_spark.operators.index_build import build_index
    from searchenginepp_spark.sources.corpus import synthesize_corpus_distributed

    spark = make_spark(cores, executor_style=executor_style,
                       fixed_parallelism=fixed_parallelism)
    try:
        spark.sparkContext.setLogLevel("ERROR")
        # SPARK_GRAFT_CORPUS_SRC: reuse a pre-generated corpus parquet so
        # paired runs (cache-mode A/B, scaling lo/hi) read IDENTICAL input
        # without paying per-run generation (measure_cache_fallback.py)
        src = os.environ.get("SPARK_GRAFT_CORPUS_SRC", "")
        if not (src and os.path.exists(src)):
            corpus = synthesize_corpus_distributed(
                spark, n_docs,
                num_partitions=fixed_parallelism or max(cores * 3, 16))
            # materialize input first so generation cost is excluded
            src = f"{workdir}/corpus_parquet"
            corpus.write.mode("overwrite").parquet(src)
        corpus = spark.read.parquet(src)

        # SPARK_GRAFT_CACHE_MODE: forces build_index's cache_postings
        # ("memory"→True, "false"→False, else passed through: auto/disk)
        cm = os.environ.get("SPARK_GRAFT_CACHE_MODE", "auto").lower()
        cache_postings = {"true": True, "memory": True,
                          "false": False}.get(cm, cm)
        phases: dict = {}
        busy0, _ = _cpu_stat()
        t0 = time.perf_counter()
        # term_partitions left to the library's data-based sizing
        # (~5M postings/partition — 2M docs would spill at cores*2)
        paths = build_index(spark, corpus, f"{workdir}/index",
                            timings=phases, cache_postings=cache_postings)
        build_s = time.perf_counter() - t0
        busy1, _ = _cpu_stat()
        res = {"build_s": build_s, "docs_per_sec": n_docs / build_s,
               "phases": phases, "cpu_s": round(busy1 - busy0, 1)}
        try:
            with open(f"{workdir}/index/manifest/build_manifest.json") as f:
                mf = json.load(f)
            res["cache_postings"] = mf.get("cache_postings")
            res["cache_decision"] = mf.get("cache_decision")
        except OSError:
            pass
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

        if QBATCH:
            # throughput at the reference's batch size (VERDICT round 3 #3):
            # one Spark job per engine over QBATCH queries, plus the
            # in-process reader looped query-at-a-time (its serving shape)
            qb = make_query_batch(QBATCH)
            t0 = time.perf_counter()
            searcher.search(qb, k=10).collect()
            exact_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            search_bmm(spark, f"{workdir}/index", qb, k=10).collect()
            bmm_s = time.perf_counter() - t0
            for q in qb:                         # warm the cursor cache
                ls.search([q], k=10)
            t0 = time.perf_counter()
            for q in qb:
                ls.search([q], k=10)
            local_s = time.perf_counter() - t0
            res["qps"] = {
                "batch_size": QBATCH,
                "exact_spark_qps": round(QBATCH / exact_s, 1),
                "bmm_spark_qps": round(QBATCH / bmm_s, 1),
                "local_warm_qps": round(QBATCH / local_s, 1),
                "exact_s": round(exact_s, 2), "bmm_s": round(bmm_s, 2),
                "local_s": round(local_s, 2),
            }
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


def _subprocess_run(cores: int, n_docs: int, workdir: str, mode: str,
                    pin_cpus: int) -> dict:
    """One pinned bench run in a fresh interpreter+JVM.  The subprocess
    reports system-wide CPU-seconds bracketing ONLY the build (valid
    because the bench owns the machine while it runs)."""
    cmd = [sys.executable, os.path.abspath(__file__),
           "--one-run", mode, str(cores), str(n_docs), workdir]
    if pin_cpus and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{pin_cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    last = [ln for ln in out.stdout.strip().split("\n") if ln.startswith("{")]
    if out.returncode != 0 or not last:
        raise RuntimeError(f"bench run failed: rc={out.returncode} "
                           f"stderr tail: {out.stderr[-500:]}")
    return json.loads(last[-1])


def run_headline() -> dict:
    """Min-of-N headline (VERDICT round 2 #1): each repetition is a fresh
    pinned subprocess/JVM at local[CPUS]; the reported figures come from
    the repetition with the smallest build+query total, with every
    repetition's total recorded in all_runs."""
    runs = []
    errors: list[str] = []
    tmp = tempfile.mkdtemp(prefix="sepp_bench_head_")
    try:
        for i in range(BENCH_RUNS):
            try:
                # pin_cpus=0 → unpinned: the headline is a throughput figure
                # comparable across rounds (r1/r2 ran unpinned; pinning
                # local[8] to 8 vCPUs measurably slows the query batch);
                # only the SCALING pairs need faithful N-core pinning
                runs.append(_subprocess_run(CPUS, N_DOCS, f"{tmp}/r{i}",
                                            "headline", 0))
            except Exception as exc:
                errors.append(str(exc)[:300])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    if not runs:
        raise RuntimeError(f"all headline runs failed: {errors}")
    best = min(runs, key=lambda r: r["build_s"] + r.get("query_s", 0.0))
    best["all_runs"] = [round(r["build_s"] + r.get("query_s", 0.0), 2)
                       for r in runs]
    best["all_build_s"] = [round(r["build_s"], 2) for r in runs]
    if errors:
        best["run_errors"] = errors
    return best


def run_scaling(executor_style: bool) -> dict | None:
    lo_runs, hi_runs = [], []
    errors = []
    mode = "executor" if executor_style else "jvm"
    tmp = tempfile.mkdtemp(prefix=f"sepp_scaling_{mode}_")
    try:
        for _ in range(SCALING_RUNS):            # alternate lo/hi
            for cores, acc, sub in ((SCALING_N, lo_runs, "lo"),
                                    (SCALING_N * 4, hi_runs, "hi")):
                # executor mode: +1 CPU for driver+master, same in both
                pin = cores + 1 if executor_style else cores
                try:
                    acc.append(_subprocess_run(
                        cores, SCALING_DOCS, f"{tmp}/{sub}", mode, pin))
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
        "mode": mode,
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
        # same logical work both configs: cpu_s ratio isolates co-residency
        # overhead from algorithmic serialization (see module docstring)
        "cpu_s_n": cpu_lo, "cpu_s_4n": cpu_hi,
        "work_scaling_efficiency": round(cpu_lo / cpu_hi, 3) if cpu_hi else None,
        "utilization_n": round(cpu_lo / (lo["build_s"] + 1e-9) / SCALING_N, 2),
        "utilization_4n": round(cpu_hi / (hi["build_s"] + 1e-9)
                                / (SCALING_N * 4), 2),
        "phases_n": lo["phases"], "phases_4n": hi["phases"],
        **({"run_errors": errors} if errors else {}),
    }


def run_headline_local8() -> dict | None:
    """A second, smaller headline at local[8] when the driver pinned a
    different parallelism (VERDICT round 3 #7): this host delivers ~8-10
    real cores, so the local[8] figure is the one comparable across rounds
    whatever SPARK_GRAFT_CPUS the harness sets."""
    if CPUS == 8:
        return None
    runs = []
    tmp = tempfile.mkdtemp(prefix="sepp_bench_head8_")
    try:
        for i in range(min(2, BENCH_RUNS)):
            try:
                runs.append(_subprocess_run(8, N_DOCS, f"{tmp}/r{i}",
                                            "headline", 0))
            except Exception:
                pass
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    if not runs:
        return None
    best = min(runs, key=lambda r: r["build_s"] + r.get("query_s", 0.0))
    return {
        "n_runs": len(runs),
        "value": round(best["build_s"] + best.get("query_s", 0.0), 3),
        "build": round(best["build_s"], 3),
        "query_batch": round(best.get("query_s", 0.0), 3),
        "docs_per_sec": round(best["docs_per_sec"], 1),
        "build_phases": best.get("phases"),
        "qps": best.get("qps"),
        "all_runs_s": [round(r["build_s"] + r.get("query_s", 0.0), 2)
                       for r in runs],
    }


def _compact_summary(out: dict) -> dict:
    """A ≤~1.5 KB digest printed as the FINAL stdout line (VERDICT round 4
    #3: the driver's stdout tail capture truncated the full JSON mid-line,
    recording parsed:null).  Every headline number survives; deep per-run
    detail lives in the full JSON (earlier line + measurements file)."""
    sc = out.get("scaling_executor") or out.get("scaling") or {}
    sc_keys = ("mode", "cores_n", "cores_4n", "n_docs", "n_runs",
               "build_s_n", "build_s_4n", "build_s_n_all", "build_s_4n_all",
               "efficiency", "work_scaling_efficiency",
               "host_ceiling_efficiency", "efficiency_vs_host_ceiling")
    qps = out.get("queries_per_sec") or {}
    l8 = out.get("headline_local8") or {}
    return {
        "metric": out["metric"], "value": out["value"], "unit": out["unit"],
        "queries": {k: v for k, v in out["queries"].items()
                    if not (k[0] == "q" and k[1:].isdigit())},  # per-qid out
        "sf": out["sf"], "docs_per_sec": out["docs_per_sec"],
        "n_docs": out["n_docs"],
        "headline_all_runs_s": out.get("headline_all_runs_s"),
        "headline_local8_s": l8.get("value"),
        "queries_per_sec": {k: qps[k] for k in
                            ("exact_spark_qps", "bmm_spark_qps",
                             "local_warm_qps") if k in qps},
        "scaling_executor": {k: sc[k] for k in sc_keys if k in sc},
        "detail": "full JSON on the preceding bench_full line and in "
                  "measurements/bench_full_latest.json",
    }


def main() -> None:
    big = run_headline()
    local8 = run_headline_local8()
    scaling = None
    scaling_exec = None
    if DO_SCALING:
        if SCALING_MODE in ("both", "jvm"):
            scaling = run_scaling(executor_style=False)
        if SCALING_MODE in ("both", "executor"):
            scaling_exec = run_scaling(executor_style=True)
    cpu = cpu_probe()
    for sc in (scaling, scaling_exec):
        if sc is None or "efficiency" not in sc:
            continue
        # the host's SAME-WINDOW delivered parallelism bounds any wall-clock
        # efficiency: ceiling = speedup(4N)/(4*speedup(N))
        s_n = cpu["speedup"].get(str(SCALING_N))
        s_4n = cpu["speedup"].get(str(SCALING_N * 4))
        if s_n and s_4n:
            ceil = s_4n / (4 * s_n)
            sc["host_ceiling_efficiency"] = round(ceil, 3)
            sc["efficiency_vs_host_ceiling"] = round(
                sc["efficiency"] / ceil, 3)
    queries = {"build": round(big["build_s"], 3),
               "query_batch": round(big.get("query_s", 0.0), 3)}
    queries.update(big.get("per_query", {}))
    out = {
        "metric": "index-build+query wall clock "
                  f"({N_DOCS} synthetic docs, local[{CPUS}], "
                  f"min of {BENCH_RUNS} fresh-JVM runs)",
        "value": round(big["build_s"] + big.get("query_s", 0.0), 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "docs_per_sec": round(big["docs_per_sec"], 1),
        "n_docs": N_DOCS,
        "headline_all_runs_s": big.get("all_runs"),
        "headline_all_build_s": big.get("all_build_s"),
        "headline_local8": local8,
        "queries_per_sec": big.get("qps"),
        "build_phases": big.get("phases"),
        "scaling": scaling,
        "scaling_executor": scaling_exec,
        "index_size": big.get("index_size"),
        "cpu": cpu,
    }
    # full detail: one stdout line (prefixed, never the parse target) + a
    # committed file; the FINAL line is the compact parse-safe summary
    full = json.dumps(out)
    try:
        os.makedirs(f"{_REPO}/measurements", exist_ok=True)
        with open(f"{_REPO}/measurements/bench_full_latest.json", "w") as f:
            f.write(full)
    except OSError:
        pass
    print(f"bench_full: {full}")
    print(json.dumps(_compact_summary(out)))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one-run":
        mode, cores, n_docs, workdir = (sys.argv[2], int(sys.argv[3]),
                                        int(sys.argv[4]), sys.argv[5])
        # scaling runs: identical partition counts in both configs, sized
        # for the pair's LARGE config (4N cores × 4-8 tasks/core; finer
        # tasks shrink the straggler tail the 4N config pays at the end of
        # every stage while the 1-task-at-a-time N config pays none)
        fixed = (int(os.environ.get("SPARK_GRAFT_SCALING_PARTS",
                                    str(SCALING_N * 32)))
                 if mode in ("jvm", "executor") else None)
        r = run_build(cores, n_docs, workdir,
                      run_queries=(mode == "headline"),
                      executor_style=(mode == "executor"),
                      fixed_parallelism=fixed)
        slim = {"build_s": r["build_s"], "docs_per_sec": r["docs_per_sec"],
                "phases": r["phases"], "cpu_s": r["cpu_s"]}
        for k in ("query_s", "per_query", "index_size", "qps",
                  "cache_postings", "cache_decision"):
            if k in r:
                slim[k] = r[k]
        print(json.dumps(slim))
    else:
        main()
