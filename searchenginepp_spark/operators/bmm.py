"""Block-Max MaxScore (BMM) — the pruned query fast path over the compressed
index shards, rank-identical to the exact DataFrame path in query.py.

Reference algorithm (/root/reference/src/index/Index.cpp:15-133):
  * posting lists sorted by their global score upper bound σ
    (Index.cpp:27-30), prefix-summed (Index.cpp:33-40);
  * "essential" lists are scored exhaustively; "non-essential" lists are
    probed only when the accumulated score plus their σ prefix could still
    beat θ (the current k-th best score), skipping whole blocks via stored
    per-block maxima and offsets (nextGEQ, Index.cpp:65-90, 181-214).

Spark re-expression: the per-query adaptive scan has no Catalyst analogue
(SURVEY.md §4), so it runs inside `applyInPandas` grouped by qid — one task
per query, each task touching only that query's (term, shard) rows, which
arrive already pruned by a pushed-down `term IN (...)` parquet predicate and
carry the σ / per-block metadata written by the sigma pass.  All block
decode/score math is numpy-vectorized; pruning decisions are per *list* and
per *block*, never per posting in Python.

The variant here is term-at-a-time MaxScore (Turtle & Flood) with block-max
skipping, which batches cleanly:
  phase 1  process lists in decreasing σ order, fully, while the σ-sum of
           the still-unprocessed lists ≥ θ (a new doc could still enter
           top-k);
  phase 2  once the remaining σ-sum < θ no unseen doc can qualify; each
           remaining list is probed only at the accumulated candidates whose
           score + this list's σ + later lists' σ ≥ θ, and only in blocks
           whose stored block-max keeps that bound alive.

Correctness: accumulated scores are lower bounds that only grow and θ is the
k-th best accumulated score, so every prune discards a doc whose true final
score is strictly below the final θ — the surviving top-k (with the
(score desc, docid asc) canonical tie-break of query.py) equals exact DAAT.
Unlike the reference we do NOT quantize the stored bounds (types.hpp:120-131
floor-truncates to 2 decimals, which can under-state a block max and prune a
true top-k doc on <0.01 margins — SURVEY.md §4); exact doubles keep the
guarantee airtight.

Salted head terms: a term split into docid-hashed sub-shards contributes one
independent list per sub-shard (disjoint docid sets, same idf), which
MaxScore handles unchanged — sub-shard σ's are tighter than the whole-term σ,
so pruning only improves.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchenginepp_spark.config import DEFAULT_TOP_K
from searchenginepp_spark.functions.codecs import (
    unary_decode, varbyte_decode,
)

_RESULT_SCHEMA = "qid long, docid long, rank long, score double"


def _skip_field(entry, name):
    # arrow hands array<struct> back as dict or Row depending on version
    return entry[name] if isinstance(entry, dict) else getattr(entry, name)


class _ListCursor:
    """One (term, shard) posting list: lazy block decode over the blobs."""

    __slots__ = ("sigma", "blocks", "docid_blob", "tf_blob", "doclen_blob",
                 "idf", "n_blocks", "last_docids", "block_ubs", "_cache")

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
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def decode_block(self, b: int, scorer_fn) -> tuple[np.ndarray, np.ndarray]:
        """→ (docids, scores) of block b; decodes only that block's byte/bit
        span (the Spark analogue of the reference's nextGEQ re-seating
        decoders at stored offsets, Index.cpp:181-214)."""
        hit = self._cache.get(b)
        if hit is not None:
            return hit
        e = self.blocks[b]
        n = int(_skip_field(e, "n_postings"))
        d_off = int(_skip_field(e, "docid_off"))
        t_off = int(_skip_field(e, "tf_bit_off"))
        l_off = int(_skip_field(e, "doclen_off"))
        base = np.uint64(_skip_field(e, "prev_docid"))
        gaps = varbyte_decode(self.docid_blob[d_off:], count=n)
        docids = (np.cumsum(gaps, dtype=np.uint64) + base).astype(np.int64)
        tfs = unary_decode(self.tf_blob, count=n, bit_offset=t_off)
        doclens = varbyte_decode(self.doclen_blob[l_off:], count=n)
        scores = scorer_fn(tfs.astype(np.float64), doclens.astype(np.float64),
                           self.idf)
        out = (docids, scores)
        self._cache[b] = out
        return out

    def decode_all(self, scorer_fn) -> tuple[np.ndarray, np.ndarray]:
        parts = [self.decode_block(b, scorer_fn) for b in range(self.n_blocks)]
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
    """Accumulator (sorted by docid) ∪ new list contributions."""
    all_ids = np.concatenate([acc_ids, ids])
    all_sc = np.concatenate([acc_sc, sc])
    uniq, inv = np.unique(all_ids, return_inverse=True)
    summed = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(summed, inv, all_sc)
    return uniq.astype(np.int64), summed


def _theta(acc_sc: np.ndarray, k: int) -> float:
    if acc_sc.size < k:
        return -np.inf
    return float(np.partition(acc_sc, acc_sc.size - k)[acc_sc.size - k])


def maxscore_query(lists: list[_ListCursor], k: int, scorer_fn) -> tuple[np.ndarray, np.ndarray]:
    """MaxScore over one query's posting lists → (docids, scores) of the
    survivors (superset of the true top-k, all with exact scores)."""
    lists = sorted(lists, key=lambda c: -c.sigma)
    sigmas = np.array([c.sigma for c in lists], dtype=np.float64)
    # rest[j] = σ-sum of lists AFTER j (still unprocessed when j is current)
    rest = np.concatenate([np.cumsum(sigmas[::-1])[::-1][1:], [0.0]])

    acc_ids = np.empty(0, dtype=np.int64)
    acc_sc = np.empty(0, dtype=np.float64)
    theta = -np.inf
    j = 0
    # phase 1 — full scoring while an unseen doc could still reach top-k
    while j < len(lists) and sigmas[j] + rest[j] >= theta:
        ids, sc = lists[j].decode_all(scorer_fn)
        acc_ids, acc_sc = _merge_acc(acc_ids, acc_sc, ids, sc)
        theta = _theta(acc_sc, k)
        j += 1
    # phase 2 — probe remaining lists only at surviving candidates
    for jj in range(j, len(lists)):
        cur = lists[jj]
        keep = acc_sc + sigmas[jj] + rest[jj] >= theta
        if not keep.any():
            continue
        cand_ids = acc_ids[keep]
        cand_pos = np.flatnonzero(keep)
        blk = np.searchsorted(cur.last_docids, cand_ids, side="left")
        in_range = blk < cur.n_blocks
        if not in_range.any():
            continue
        cand_ids, cand_pos, blk = cand_ids[in_range], cand_pos[in_range], blk[in_range]
        # block-max refinement: candidate survives only if this block's max
        # keeps the bound alive
        alive = acc_sc[cand_pos] + cur.block_ubs[blk] + rest[jj] >= theta
        if not alive.any():
            continue
        cand_ids, cand_pos, blk = cand_ids[alive], cand_pos[alive], blk[alive]
        for b in np.unique(blk):
            sel = blk == b
            b_ids, b_sc = cur.decode_block(int(b), scorer_fn)
            pos = np.searchsorted(b_ids, cand_ids[sel])
            pos_ok = pos < b_ids.size
            hit = np.zeros(sel.sum(), dtype=bool)
            hit[pos_ok] = b_ids[pos[pos_ok]] == cand_ids[sel][pos_ok]
            tgt = cand_pos[sel][hit]
            acc_sc[tgt] += b_sc[pos[pos_ok][hit[pos_ok]]]
        theta = _theta(acc_sc, k)

    if acc_sc.size > k:
        # drop provably-out docs (partial-scored prunees are below θ)
        keep = acc_sc >= theta
        acc_ids, acc_sc = acc_ids[keep], acc_sc[keep]
    return acc_ids, acc_sc


def search_bmm(spark: SparkSession, index_root: str,
               queries: Iterable[tuple[int, str]], k: int = DEFAULT_TOP_K,
               scorer: str = "bm25", stem: bool = True,
               round_to: int | None = 6) -> DataFrame:
    """Top-k disjunctive search over a persisted index via Block-Max
    MaxScore.  Same results as query.search (the exact path); prunes block
    decodes instead of decoding every posting.

    Plan: parquet scan of the shard table with `term IN (...)` pushed down →
    broadcast-join the per-query term sets → applyInPandas per qid runs
    MaxScore → broadcast-join docnos for the final k rows.
    """
    from searchenginepp_spark.config import BM25_B, BM25_K1
    from searchenginepp_spark.operators.index_build import IndexPaths
    from searchenginepp_spark.operators.query import (
        query_terms_df, query_terms_local, resolve_docnos,
    )

    paths = IndexPaths(index_root)
    stats = spark.read.parquet(paths.stats).collect()[0]
    n_docs = int(stats["n_docs"])
    avgdl = (stats["sum_doclen"] / n_docs) if n_docs else 0.0
    qt = query_terms_local(queries, stem=stem)
    qterms = query_terms_df(spark, qt)
    terms = sorted({t for _, t in qt})
    if not terms:
        return spark.createDataFrame(
            [], schema="qid long, docid long, docno string, rank long, score double")

    lexicon = spark.read.parquet(paths.lexicon).filter(F.col("term").isin(terms))
    shards = (
        spark.read.parquet(paths.shards)
        .filter(F.col("term").isin(terms))
        .join(F.broadcast(lexicon.withColumnRenamed("df", "df_global")), "term")
        .join(F.broadcast(qterms), "term")
        .withColumn("n_docs_f", F.lit(float(n_docs)))
    )
    scorer_fn = _make_scorer(scorer, float(avgdl), BM25_K1, BM25_B)
    kk = int(k)
    rnd = round_to

    def run_query(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["qid"].iloc[0])
        lists = [_ListCursor(row, scorer) for row in pdf.itertuples(index=False)]
        ids, sc = maxscore_query(lists, kk, scorer_fn)
        if rnd is not None:
            sc = np.round(sc, rnd)
        order = np.lexsort((ids, -sc))[:kk]
        return pd.DataFrame({
            "qid": np.full(order.size, qid, dtype=np.int64),
            "docid": ids[order],
            "rank": np.arange(1, order.size + 1, dtype=np.int64),
            "score": sc[order],
        })

    results = shards.groupBy("qid").applyInPandas(run_query, schema=_RESULT_SCHEMA)
    return resolve_docnos(results, spark.read.parquet(paths.docmap))
