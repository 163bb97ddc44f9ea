"""LocalSearcher AND-merge kernel (no Spark): exact intersection + score
sum, salted sub-lists, and the round-5 skip contract — later (larger) lists
decode only the blocks a surviving candidate lands in, never the whole list
(the skip analogue of the reference's nextGEQ AND-merge,
/root/reference/src/index/Index.template.hpp:117-121)."""

import numpy as np
import pyarrow as pa

from searchenginepp_spark.config import BM25_B, BM25_K1
from searchenginepp_spark.operators.bmm import _ListCursor, _make_scorer
from searchenginepp_spark.operators.index_build import _encode_groups
from searchenginepp_spark.operators.local_engine import LocalSearcher

AVGDL = 100.0
N_DOCS = 10_000


class _Row:
    def __init__(self, enc: dict, df_global: int):
        for k, v in enc.items():
            setattr(self, k, v)
        self.df_global = df_global
        self.n_docs_f = float(N_DOCS)


def _cursor(docids, seed=0, block_size=32):
    docids = np.asarray(sorted(docids), dtype=np.int64)
    r = np.random.default_rng(seed)
    tfs = (1 + r.geometric(0.5, size=docids.size)).astype(np.int64)
    dls = r.integers(40, 200, size=docids.size).astype(np.int64)
    rows = _encode_groups(pa.array(["t"] * docids.size),
                          np.zeros(docids.size, dtype=np.int64),
                          docids, tfs, dls, np.array([], dtype=np.int64),
                          block_size, AVGDL)
    return _ListCursor(_Row(rows[0], docids.size), "bm25")


class _FakeLS:
    def __init__(self, dfs):
        self.df_by_term = dfs


def _brute_and(cursors_by_term, terms, fn):
    per_term = {}
    for t, subs in cursors_by_term.items():
        ids = np.concatenate([c.decode_all(fn)[0] for c in subs])
        sc = np.concatenate([c.decode_all(fn)[1] for c in subs])
        o = np.argsort(ids)
        per_term[t] = (ids[o], sc[o])
    acc = {}
    first = True
    for t in dict.fromkeys(terms):
        ids, sc = per_term[t]
        cur = dict(zip(ids.tolist(), sc.tolist()))
        if first:
            acc = cur
            first = False
        else:
            acc = {d: s + cur[d] for d, s in acc.items() if d in cur}
    a = np.array(sorted(acc), dtype=np.int64)
    return a, np.array([acc[d] for d in a.tolist()], dtype=np.float64)


def test_and_merge_exact_and_salted():
    rng = np.random.default_rng(3)
    big1 = rng.choice(N_DOCS, size=6000, replace=False)
    big2 = rng.choice(N_DOCS, size=5500, replace=False)
    small = rng.choice(N_DOCS, size=150, replace=False)
    # salted term: two docid-disjoint sub-lists
    sal = rng.choice(N_DOCS, size=4000, replace=False)
    sal_a, sal_b = sal[sal % 2 == 0], sal[sal % 2 == 1]

    cursors = {
        "b1": [_cursor(big1, 1)],
        "b2": [_cursor(big2, 2)],
        "s": [_cursor(small, 3)],
        "sal": [_cursor(sal_a, 4), _cursor(sal_b, 5)],
    }
    fn = _make_scorer("bm25", AVGDL, BM25_K1, BM25_B)
    ls = _FakeLS({"b1": 6000, "b2": 5500, "s": 150, "sal": 4000})

    for terms in (["b1", "b2"], ["s", "b1"], ["sal", "b2"],
                  ["s", "sal", "b1", "b2"], ["b1", "b1", "s"]):
        got_i, got_s = LocalSearcher._conjunctive(ls, terms, cursors, fn)
        want_i, want_s = _brute_and(cursors, terms, fn)
        order = np.argsort(got_i)
        assert np.array_equal(got_i[order], want_i), terms
        assert np.allclose(got_s[order], want_s, atol=1e-12), terms


def test_and_merge_skips_noncandidate_blocks():
    """A selective AND head query must not decode head blocks no candidate
    lands in (and must not promote the head cursor to a full decode)."""
    rng = np.random.default_rng(9)
    head = _cursor(np.arange(N_DOCS), 7, block_size=64)   # 157 blocks
    # candidates clustered at the front → most head blocks untouched
    small_ids = rng.choice(600, size=40, replace=False)
    small = _cursor(small_ids, 8)
    cursors = {"s": [small], "h": [head]}
    fn = _make_scorer("bm25", AVGDL, BM25_K1, BM25_B)
    ls = _FakeLS({"s": 40, "h": N_DOCS})

    ids, sc = LocalSearcher._conjunctive(ls, ["h", "s"], cursors, fn)
    assert ids.size == 40                                 # all contained
    assert head._full is None, "head list must not be fully decoded"
    assert len(head._cache) <= 11   # 40 cands in docids < 600 → ≤ 10 blocks
    want_i, want_s = _brute_and(cursors, ["h", "s"], fn)
    order = np.argsort(ids)
    assert np.array_equal(ids[order], want_i)
    assert np.allclose(sc[order], want_s, atol=1e-12)


def test_and_merge_empty_intersection_and_single_term():
    fn = _make_scorer("bm25", AVGDL, BM25_K1, BM25_B)
    a = _cursor(np.arange(0, 500), 1)
    b = _cursor(np.arange(5000, 5500), 2)
    ls = _FakeLS({"a": 500, "b": 500})
    ids, sc = LocalSearcher._conjunctive(ls, ["a", "b"],
                                         {"a": [a], "b": [b]}, fn)
    assert ids.size == 0 and sc.size == 0

    ids, sc = LocalSearcher._conjunctive(ls, ["a"], {"a": [a]}, fn)
    want_i, want_s = _brute_and({"a": [a]}, ["a"], fn)
    order = np.argsort(ids)
    assert np.array_equal(ids[order], want_i)
    assert np.allclose(sc[order], want_s, atol=1e-12)
