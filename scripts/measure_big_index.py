#!/usr/bin/env python
"""Big-index build + warm point-query latency (VERDICT round 4 #4 'Done'
evidence): build a 2.5M-doc index once at local[8] (unpinned, same shape
as measurements/round4_2p5M_build.json), then measure the in-process
LocalSearcher's WARM latency per query — including single HEAD-term
queries, the case that cost ≈0.5 s in round 4 because phase 1 decoded the
whole posting list before block-max pruning existed.

Writes measurements/round5_2p5M_build.json.  Usage:

    python scripts/measure_big_index.py [--docs 2500000] [--reps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAD_TERMS = ["int", "return", "static", "const"]
MULTI_QUERIES = [
    (1, "sym1 sym2 fn_3"),
    (2, "int return"),
    (3, "twinkle wonder world"),
    (4, "sym10 sym20 sym30 sym40"),
    (5, "fn_100 static const"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_500_000)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--out", default="measurements/round5_2p5M_build.json",
                    help="output JSON path relative to the repo root")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="sepp_bigidx_")
    out: dict = {"n_docs": args.docs, "cores": 8,
                 "mode": "local[8] unpinned, auto partitions"}
    try:
        cmd = [sys.executable, f"{REPO}/bench.py", "--one-run", "headline",
               "8", str(args.docs), tmp]
        t0 = time.perf_counter()
        run = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=7200)
        last = [ln for ln in run.stdout.strip().split("\n")
                if ln.startswith("{")]
        if run.returncode != 0 or not last:
            raise RuntimeError(f"build run failed rc={run.returncode} "
                               f"stderr tail: {run.stderr[-800:]}")
        out["build"] = json.loads(last[-1])
        print(f"build+bench subprocess done in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

        from searchenginepp_spark.operators.local_engine import LocalSearcher

        ls = LocalSearcher(f"{tmp}/index")
        lat: dict = {}
        queries = ([(100 + i, t) for i, t in enumerate(HEAD_TERMS)]
                   + MULTI_QUERIES)
        for qid, text in queries:            # warm the cursor cache
            ls.search([(qid, text)], k=10)
        for qid, text in queries:
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                ls.search([(qid, text)], k=10)
                times.append((time.perf_counter() - t0) * 1000)
            times.sort()
            lat[text] = {
                "warm_ms_p50": round(statistics.median(times), 2),
                "warm_ms_min": round(times[0], 2),
                "warm_ms_p95": round(times[int(len(times) * 0.95) - 1], 2),
            }
            if " " not in text:
                from searchenginepp_spark.functions.porter2 import stem

                lat[text]["df"] = ls.df_by_term.get(
                    stem(text) if ls.stem else text, None)
            print(f"{text!r}: {lat[text]}", flush=True)
        out["warm_latency"] = lat
        heads = [lat[t]["warm_ms_p50"] for t in HEAD_TERMS]
        out["head_term_warm_ms_p50_max"] = max(heads)
    finally:
        if not args.keep:
            shutil.rmtree(tmp, ignore_errors=True)

    os.makedirs(f"{REPO}/measurements", exist_ok=True)
    path = os.path.join(REPO, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("n_docs", "head_term_warm_ms_p50_max")}))
    print(f"written: {path}")


if __name__ == "__main__":
    main()
