"""Property-based MaxScore correctness — random posting lists, random
queries: the pruned survivor set must contain every true top-k doc with its
exact score.  Runs without Spark (the kernel is pure numpy over cursors
built by the real encoder)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginepp_spark.config import BM25_B, BM25_K1
from searchenginepp_spark.operators.bmm import (
    _ListCursor, _make_scorer, maxscore_query,
)
from searchenginepp_spark.operators.index_build import _encode_groups

AVGDL = 100.0
N_DOCS_F = 1000.0


class _Row:
    def __init__(self, enc: dict, df_global: int):
        for k, v in enc.items():
            setattr(self, k, v)
        self.df_global = df_global
        self.n_docs_f = N_DOCS_F


def _make_cursor(docids, tfs, doclens, df_global, block_size, scorer="bm25"):
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    doclens = np.asarray(doclens, dtype=np.int64)
    rows = _encode_groups(pa.array(["t"] * len(docids)),
                          np.zeros(len(docids), dtype=np.int64),
                          docids, tfs, doclens,
                          np.array([], dtype=np.int64),
                          block_size, AVGDL)
    return _ListCursor(_Row(rows[0], df_global), scorer)


@st.composite
def query_lists(draw):
    n_lists = draw(st.integers(2, 5))
    lists = []
    for _ in range(n_lists):
        df = draw(st.integers(1, 60))
        docids = sorted(draw(st.sets(st.integers(1, 200), min_size=df,
                                     max_size=df)))
        tfs = [draw(st.integers(1, 9)) for _ in docids]
        dls = [draw(st.integers(20, 300)) for _ in docids]
        lists.append((docids, tfs, dls))
    k = draw(st.integers(1, 12))
    block = draw(st.sampled_from([4, 16, 64]))
    return lists, k, block


@settings(max_examples=60, deadline=None)
@given(query_lists())
def test_maxscore_contains_exact_topk(data):
    lists, k, block = data
    scorer_fn = _make_scorer("bm25", AVGDL, BM25_K1, BM25_B)
    cursors = [_make_cursor(d, t, dl, df_global=len(d), block_size=block)
               for d, t, dl in lists]

    # brute force: per-doc sum of idf * part over all lists
    truth: dict[int, float] = {}
    for (docids, tfs, dls), cur in zip(lists, cursors):
        sc = scorer_fn(np.array(tfs, dtype=np.float64),
                       np.array(dls, dtype=np.float64), cur.idf)
        for d, s in zip(docids, sc):
            truth[d] = truth.get(d, 0.0) + float(s)
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    ids, scores = maxscore_query(cursors, k, scorer_fn)
    got = dict(zip(ids.tolist(), scores.tolist()))
    for d, s in want:
        assert d in got, f"true top-{k} doc {d} pruned"
        assert got[d] == pytest.approx(s, abs=1e-12)


@settings(max_examples=20, deadline=None)
@given(query_lists())
def test_maxscore_survivor_scores_are_exact_or_underestimates(data):
    """Every survivor's reported score must never EXCEED its true score
    (partial-scored prunees may be underestimated but can never outrank a
    true top-k doc)."""
    lists, k, block = data
    scorer_fn = _make_scorer("bm25", AVGDL, BM25_K1, BM25_B)
    cursors = [_make_cursor(d, t, dl, df_global=len(d), block_size=block)
               for d, t, dl in lists]
    truth: dict[int, float] = {}
    for (docids, tfs, dls), cur in zip(lists, cursors):
        sc = scorer_fn(np.array(tfs, dtype=np.float64),
                       np.array(dls, dtype=np.float64), cur.idf)
        for d, s in zip(docids, sc):
            truth[d] = truth.get(d, 0.0) + float(s)
    ids, scores = maxscore_query(cursors, k, scorer_fn)
    for d, s in zip(ids.tolist(), scores.tolist()):
        assert s <= truth[d] + 1e-9
