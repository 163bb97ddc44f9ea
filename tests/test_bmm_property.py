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


@st.composite
def one_list(draw):
    df = draw(st.integers(1, 120))
    docids = sorted(draw(st.sets(st.integers(1, 400), min_size=df,
                                 max_size=df)))
    # narrow tf/doclen ranges → many exact and rounded score ties
    tfs = [draw(st.integers(1, 3)) for _ in docids]
    dls = [draw(st.sampled_from([50, 100])) for _ in docids]
    k = draw(st.integers(1, 12))
    block = draw(st.sampled_from([4, 16, 64]))
    round_to = draw(st.sampled_from([None, 6, 2]))
    df_global = draw(st.sampled_from([df, int(N_DOCS_F)]))  # incl. idf==0
    return docids, tfs, dls, k, block, round_to, df_global


@settings(max_examples=80, deadline=None)
@given(one_list())
def test_single_list_topk_exact_under_canonical_order(data):
    """The single-list kernel + the caller's canonicalization (round →
    lexsort by (-score, docid) → take k) must equal the brute-force top-k
    under the same total order — including rounded-tie groups straddling
    the k boundary (round 5: the kernel itself shrinks to ≤ k rows using
    the docid-asc tie-break, so the shrink must pick exactly the canonical
    winners) and the df==N idf-0 degenerate where every score ties at 0."""
    docids, tfs, dls, k, block, round_to, df_global = data
    scorer_fn = _make_scorer("bm25", AVGDL, BM25_K1, BM25_B)
    cur = _make_cursor(docids, tfs, dls, df_global=df_global,
                       block_size=block)
    eps = 10.0 ** -round_to if round_to is not None else 0.0

    ids, sc = maxscore_query([cur], k, scorer_fn, eps=eps)
    assert ids.size <= max(k, 1) + block  # kernel pre-shrinks its output
    if round_to is not None:
        sc = np.round(sc, round_to)
    order = np.lexsort((ids, -sc))[:k]
    got = list(zip(ids[order].tolist(), sc[order].tolist()))

    true_sc = scorer_fn(np.array(tfs, dtype=np.float64),
                        np.array(dls, dtype=np.float64), cur.idf)
    if round_to is not None:
        true_sc = np.round(true_sc, round_to)
    want = sorted(zip(docids, true_sc.tolist()),
                  key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want


@st.composite
def acc_and_list(draw):
    n = draw(st.integers(0, 80))
    m = draw(st.integers(0, 80))
    acc_ids = sorted(draw(st.sets(st.integers(1, 120), min_size=n,
                                  max_size=n)))
    ids = sorted(draw(st.sets(st.integers(1, 120), min_size=m, max_size=m)))
    acc_sc = [draw(st.floats(0.0, 10.0, allow_nan=False)) for _ in acc_ids]
    sc = [draw(st.floats(0.0, 10.0, allow_nan=False)) for _ in ids]
    return acc_ids, acc_sc, ids, sc


@settings(max_examples=80, deadline=None)
@given(acc_and_list())
def test_merge_acc_matches_unique_reference(data):
    """The O(n+m) sorted merge (round 5) must equal the old np.unique +
    add.at reference on any pair of docid-sorted unique inputs, and must
    not mutate its inputs (decode_selected may return cursor-cached
    arrays)."""
    from searchenginepp_spark.operators.bmm import _merge_acc

    acc_ids, acc_sc, ids, sc = data
    a_i = np.array(acc_ids, dtype=np.int64)
    a_s = np.array(acc_sc, dtype=np.float64)
    l_i = np.array(ids, dtype=np.int64)
    l_s = np.array(sc, dtype=np.float64)
    a_i0, a_s0, l_i0, l_s0 = a_i.copy(), a_s.copy(), l_i.copy(), l_s.copy()

    got_i, got_s = _merge_acc(a_i, a_s, l_i, l_s)

    all_i = np.concatenate([a_i0, l_i0])
    all_s = np.concatenate([a_s0, l_s0])
    uniq, inv = np.unique(all_i, return_inverse=True)
    summed = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(summed, inv, all_s)

    np.testing.assert_array_equal(got_i, uniq.astype(np.int64))
    np.testing.assert_allclose(got_s, summed, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(a_i, a_i0)
    np.testing.assert_array_equal(l_i, l_i0)
    np.testing.assert_array_equal(l_s, l_s0)


def test_decode_selected_full_promotion_parity():
    """decode_selected must return identical postings whether it decodes
    per block or slices the promoted cached full decode, and decode_block
    served from _full must equal a fresh per-block decode."""
    rng = np.random.default_rng(7)
    docids = np.sort(rng.choice(5000, size=900, replace=False))
    tfs = rng.integers(1, 9, size=900)
    dls = rng.integers(20, 300, size=900)
    scorer_fn = _make_scorer("bm25", AVGDL, BM25_K1, BM25_B)

    fresh = _make_cursor(docids, tfs, dls, df_global=900, block_size=64)
    sel = np.array([0, 3, 4, 5, 9, fresh.n_blocks - 1], dtype=np.int64)
    want = fresh.decode_selected(sel, scorer_fn)  # minority → per-block path
    assert fresh._full is None

    warm = _make_cursor(docids, tfs, dls, df_global=900, block_size=64)
    warm.decode_all(scorer_fn)                    # promotes to _full
    assert warm._full is not None and not warm._cache
    got = warm.decode_selected(sel, scorer_fn)    # sliced from _full
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_allclose(got[1], want[1], rtol=0, atol=0)

    b = int(fresh.n_blocks // 2)
    np.testing.assert_array_equal(warm.decode_block(b, scorer_fn)[0],
                                  fresh.decode_block(b, scorer_fn)[0])


@st.composite
def salted_query_lists(draw):
    """2-3 logical terms, each possibly SPLIT into docid-disjoint salt
    shards (hash-interleaved docids, like the build's salted head terms)."""
    n_terms = draw(st.integers(1, 3))
    terms = []
    for _ in range(n_terms):
        df = draw(st.integers(2, 80))
        docids = sorted(draw(st.sets(st.integers(1, 250), min_size=df,
                                     max_size=df)))
        tfs = [draw(st.integers(1, 9)) for _ in docids]
        dls = [draw(st.integers(20, 300)) for _ in docids]
        n_salts = draw(st.integers(1, 3))
        terms.append((docids, tfs, dls, n_salts))
    k = draw(st.integers(1, 12))
    block = draw(st.sampled_from([4, 16]))
    return terms, k, block


@settings(max_examples=60, deadline=None)
@given(salted_query_lists())
def test_maxscore_grouped_salted_matches_exact(data):
    """maxscore_query with groups= (round 5): salt shards of one term are
    docid-disjoint sub-lists; the grouped kernel must still contain every
    true top-k doc with its exact score, where truth scores each doc ONCE
    per term (σ of a group is max, not Σ — the pruning must stay sound
    with the tighter bound)."""
    terms, k, block = data
    scorer_fn = _make_scorer("bm25", AVGDL, BM25_K1, BM25_B)

    cursors, groups = [], []
    truth: dict[int, float] = {}
    for g, (docids, tfs, dls, n_salts) in enumerate(terms):
        df_global = len(docids)
        for s in range(n_salts):
            sel = [i for i, d in enumerate(docids) if d % n_salts == s]
            if not sel:
                continue
            cur = _make_cursor([docids[i] for i in sel],
                               [tfs[i] for i in sel],
                               [dls[i] for i in sel],
                               df_global=df_global, block_size=block)
            cursors.append(cur)
            groups.append(f"t{g}")
        idf = float(np.log2(N_DOCS_F / df_global))
        sc = scorer_fn(np.array(tfs, dtype=np.float64),
                       np.array(dls, dtype=np.float64), idf)
        for d, s_ in zip(docids, sc):
            truth[d] = truth.get(d, 0.0) + float(s_)

    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    ids, scores = maxscore_query(cursors, k, scorer_fn, groups=groups)
    got = dict(zip(ids.tolist(), scores.tolist()))
    for d, s_ in want:
        assert d in got, f"true top-{k} doc {d} pruned (grouped)"
        assert got[d] == pytest.approx(s_, abs=1e-12)


@settings(max_examples=60, deadline=None)
@given(query_lists())
def test_maxscore_boosted_theta_contains_exact_topk(data):
    """Same exact-top-k containment as test_maxscore_contains_exact_topk but
    with the probe-seeded θ boost FORCED (round 5: _BOOST_MIN patched to 0 so
    even toy accumulators take the boost path).  θ_boost is the k-th best of
    exact probed totals of real docs, hence ≤ θ_final — every prune must stay
    sound and every true top-k doc must survive with its exact score."""
    import searchenginepp_spark.operators.bmm as bmm_mod

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
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    old_min, old_m = bmm_mod._BOOST_MIN, bmm_mod._BOOST_M
    bmm_mod._BOOST_MIN, bmm_mod._BOOST_M = 0, 4
    try:
        ids, scores = maxscore_query(cursors, k, scorer_fn)
    finally:
        bmm_mod._BOOST_MIN, bmm_mod._BOOST_M = old_min, old_m
    got = dict(zip(ids.tolist(), scores.tolist()))
    for d, s in want:
        assert d in got, f"true top-{k} doc {d} pruned under boosted theta"
        assert got[d] == pytest.approx(s, abs=1e-12)


def test_boost_theta_is_lower_bound_and_triggers_on_head_terms():
    """Deterministic head-term shape (two dense overlapping lists): the
    boosted θ must be ≤ θ_final yet ≥ the unboosted (single-list) θ, and the
    boosted query must return the exact canonical top-k."""
    import searchenginepp_spark.operators.bmm as bmm_mod
    from searchenginepp_spark.operators.bmm import _boost_theta, _theta

    n = int(N_DOCS_F)          # df < n_docs_f keeps idf positive (head term)
    k = 10
    scorer_fn = _make_scorer("bm25", AVGDL, BM25_K1, BM25_B)

    def dense(frac, seed):
        r = np.random.default_rng(seed)
        ids = np.sort(r.choice(n, size=int(n * frac), replace=False))
        tfs = 1 + r.geometric(0.6, size=ids.size)
        dls = r.integers(50, 200, size=ids.size)
        return ids.tolist(), tfs.tolist(), dls.tolist()

    l1, l2 = dense(0.98, 1), dense(0.97, 2)
    c1 = _make_cursor(*l1, df_global=len(l1[0]), block_size=64)
    c2 = _make_cursor(*l2, df_global=len(l2[0]), block_size=64)

    i1, s1 = c1.decode_all(scorer_fn)
    theta_single = _theta(s1, k)
    theta_boost = _boost_theta([[c2]], i1, s1, k, scorer_fn)

    truth: dict[int, float] = {}
    for (docids, tfs, dls), cur in zip((l1, l2), (c1, c2)):
        sc = scorer_fn(np.array(tfs, dtype=np.float64),
                       np.array(dls, dtype=np.float64), cur.idf)
        for d, s in zip(docids, sc):
            truth[d] = truth.get(d, 0.0) + float(s)
    ranked = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))
    theta_final = ranked[k - 1][1]

    assert theta_single <= theta_boost <= theta_final + 1e-12
    assert theta_boost > theta_single          # the boost actually tightens

    ids, scores = maxscore_query([c1, c2], k, scorer_fn, eps=1e-6,
                                 groups=["a", "b"])
    got = dict(zip(ids.tolist(), scores.tolist()))
    for d, s in ranked[:k]:
        assert d in got and got[d] == pytest.approx(s, abs=1e-12)


def test_boost_theta_ulp_tie_regression():
    """Round-6 regression (VERDICT round-5 #1): a doc that attains the
    block max in EVERY remaining group makes the probed θ tie its own
    prune bound in exact arithmetic; summation-order ULP noise then used
    to drop θ's supporter at eps=0 and maxscore_query returned EMPTY.
    Deterministic 5-list reduction of the hypothesis counterexample:
    true top-1 is doc 21 and must survive with its exact score."""
    import searchenginepp_spark.operators.bmm as bmm_mod

    scorer_fn = _make_scorer("bm25", AVGDL, BM25_K1, BM25_B)
    k, block = 1, 4
    lists = [
        (list(range(1, 42)), [1] * 41, [20] * 41),   # A: docids 1..41
        ([1], [1], [20]),                            # B
        ([21], [1], [20]),                           # C
        ([21], [1], [20]),                           # D
        ([21], [1], [21]),                           # E
    ]
    cursors = [_make_cursor(d, t, dl, df_global=len(d), block_size=block)
               for d, t, dl in lists]
    truth: dict[int, float] = {}
    for (docids, tfs, dls), cur in zip(lists, cursors):
        sc = scorer_fn(np.array(tfs, dtype=np.float64),
                       np.array(dls, dtype=np.float64), cur.idf)
        for d, s in zip(docids, sc):
            truth[d] = truth.get(d, 0.0) + float(s)
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert want[0][0] == 21

    old_min, old_m = bmm_mod._BOOST_MIN, bmm_mod._BOOST_M
    bmm_mod._BOOST_MIN, bmm_mod._BOOST_M = 0, 4
    try:
        ids, scores = maxscore_query(cursors, k, scorer_fn)  # eps=0
    finally:
        bmm_mod._BOOST_MIN, bmm_mod._BOOST_M = old_min, old_m
    got = dict(zip(ids.tolist(), scores.tolist()))
    for d, s in want:
        assert d in got, f"true top-{k} doc {d} pruned (ULP tie)"
        assert got[d] == pytest.approx(s, abs=1e-12)
