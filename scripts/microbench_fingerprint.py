#!/usr/bin/env python
"""Microbench: doc_fingerprint gram-hash kernel, vectorized polynomial vs
the former per-gram hashlib.md5 loop (VERDICT round 2 #3 asked for ≥20×
grams/s/core).  Pure-Python, no Spark — measures the kernel alone."""

from __future__ import annotations

import hashlib
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from searchenginepp_spark.operators.text_analysis import (  # noqa: E402
    FP_GRAM_LEN, FP_MOD, fp_gram_hashes,
)


def md5_loop(lt: str, k: int, mod: int) -> set[int]:
    """The round-2 kernel (per-gram md5), kept for the comparison."""
    sel: set[int] = set()
    for i in range(max(len(lt) - (k - 1), 0)):
        h = int(hashlib.md5(lt[i:i + k].encode("utf-8")).hexdigest()[:7], 16)
        if h % mod == 0:
            sel.add(h)
    return sel


def poly_doc(lt: str, k: int, mod: int) -> np.ndarray:
    cps = np.frombuffer(lt.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    h = fp_gram_hashes(cps, k)
    return np.unique(h[h % mod == 0])


def main() -> None:
    rng = np.random.default_rng(42)
    docs = ["".join(chr(c) for c in rng.integers(97, 123, size=4000))
            for _ in range(50)]
    total_grams = sum(len(d) - (FP_GRAM_LEN - 1) for d in docs)

    t0 = time.perf_counter()
    for d in docs:
        md5_loop(d, FP_GRAM_LEN, FP_MOD)
    t_md5 = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(10):                       # poly is fast; average 10 reps
        for d in docs:
            poly_doc(d, FP_GRAM_LEN, FP_MOD)
    t_poly = (time.perf_counter() - t0) / 10

    out = {
        "n_docs": len(docs), "total_grams": total_grams,
        "md5_grams_per_s": round(total_grams / t_md5),
        "poly_grams_per_s": round(total_grams / t_poly),
        "speedup": round(t_md5 / t_poly, 1),
    }
    print(json.dumps(out))
    # selection-rate sanity: ~1/FP_MOD of distinct grams selected
    sel = sum(poly_doc(d, FP_GRAM_LEN, FP_MOD).size for d in docs)
    print(json.dumps({"selected_frac_of_grams": round(sel / total_grams, 4),
                      "expected_about": round(1 / FP_MOD, 4)}))


if __name__ == "__main__":
    main()
