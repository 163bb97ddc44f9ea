#!/usr/bin/env python
"""Microbench: per-block decode cost must be INDEPENDENT of posting-list
length (VERDICT round 1 #4).  Builds posting lists of growing length with
fixed block size, then times decode_block(0) on each — O(block) slicing on
the stored skip offsets means flat cost; the round-1 code sliced to the end
of the blob (varbyte) / unpacked the whole tf stream (unary), so cost grew
linearly with list length.

Run: python scripts/microbench_decode.py
"""

from __future__ import annotations

import os
import sys
import time
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from searchenginepp_spark.functions.codecs import (  # noqa: E402
    delta_encode, unary_encode, unary_value_bit_offsets, varbyte_encode,
    varbyte_value_offsets,
)
from searchenginepp_spark.operators.bmm import (  # noqa: E402
    _ListCursor, _make_scorer,
)

BLOCK = 128


def make_row(n_postings: int) -> SimpleNamespace:
    rng = np.random.default_rng(7)
    docids = np.cumsum(rng.integers(1, 50, n_postings).astype(np.uint64))
    tfs = rng.integers(1, 5, n_postings).astype(np.int64)
    doclens = rng.integers(50, 300, n_postings).astype(np.uint64)
    gaps = delta_encode(docids)
    d_offs = varbyte_value_offsets(gaps)
    t_offs = unary_value_bit_offsets(tfs)
    l_offs = varbyte_value_offsets(doclens)
    bs = np.arange(0, n_postings, BLOCK)
    be = np.minimum(bs + BLOCK, n_postings) - 1
    skips = [{
        "last_docid": int(docids[e]),
        "prev_docid": int(docids[s - 1]) if s else 0,
        "n_postings": int(e - s + 1),
        "docid_off": int(d_offs[s]),
        "tf_bit_off": int(t_offs[s]),
        "doclen_off": int(l_offs[s]),
        "bm25_part_ub": 1.0, "tfidf_part_ub": 1.0,
    } for s, e in zip(bs, be)]
    return SimpleNamespace(
        skips=skips, docid_blob=varbyte_encode(gaps),
        tf_blob=unary_encode(tfs), doclen_blob=varbyte_encode(doclens),
        sigma_bm25_part=1.0, sigma_tfidf_part=1.0,
        df_global=n_postings, n_docs_f=float(n_postings) * 10,
    )


def main() -> None:
    fn = _make_scorer("bm25", 100.0, 0.82, 0.68)
    reps = 2000
    print(f"{'list len':>12} {'us/block-decode':>16}")
    base = None
    for n in (1_000, 10_000, 100_000, 1_000_000):
        cur = _ListCursor(make_row(n), "bm25")
        cur.decode_block(0, fn)                      # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            cur._cache.clear()
            cur.decode_block(0, fn)
        us = (time.perf_counter() - t0) / reps * 1e6
        base = base or us
        print(f"{n:>12} {us:>16.1f}   ({us / base:.2f}x vs shortest)")
    print("flat ratio ≈ 1.0x ⇒ decode_block touches only the block's span")


if __name__ == "__main__":
    main()
