"""Semantic tests for the training-pipeline dedup + similarity operators,
pinned against planted duplicates and a numpy brute-force oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.dedup import (
    exact_duplicates, minhash_lsh_candidates, ngram_jaccard_pairs, simhash,
    simhash_near_pairs,
)
from searchenginepp_spark.operators.similarity import (
    cosine_topk, embedding_near_dup_pairs, ivf_ann_topk, ivf_assign,
    ivf_centroid_ids, lsh_ann_topk,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    """Synthetic docs with PLANTED exact and near duplicates."""
    base = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # exact dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),  # near dup of 1
        (4, "one two three four five six seven eight nine ten"),
        (5, "completely different tokens nothing shared here at all friend"),
        (6, "one two three four five six seven eight nine ten"),           # exact dup of 4
    ]
    return spark.createDataFrame(base, "docid long, content string")


@pytest.fixture(scope="module")
def testdata_docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").alias("docid"), F.col("text").alias("content"))


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_duplicates(spark, docs):
    rows = {r["canonical_docid"]: r["n_dups"]
            for r in exact_duplicates(docs).collect()}
    assert rows[1] == 2 and rows[4] == 2
    assert sum(rows.values()) == 6


def test_ngram_jaccard_finds_planted_near_dup(spark, docs):
    pairs = {(r["docid_a"], r["docid_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0 and pairs[(4, 6)] == 1.0
    assert 0.5 <= pairs[(1, 3)] < 1.0       # 7 of 8 shingles shared
    assert (1, 5) not in pairs and (4, 5) not in pairs


def test_minhash_lsh_supersets_high_jaccard(spark, testdata_docs):
    """Every pair with true Jaccard ≥ 0.9 must be an LSH candidate (16 perms
    / 4 bands: miss prob (1-j^4)^4 < 1e-3 at j=0.9 — the planted near-dups
    at ~0.99 are effectively guaranteed)."""
    truth = {(r["docid_a"], r["docid_b"])
             for r in ngram_jaccard_pairs(testdata_docs, n=3,
                                          threshold=0.9).collect()}
    cand = {(r["docid_a"], r["docid_b"])
            for r in minhash_lsh_candidates(testdata_docs, n=3).collect()}
    assert truth, "testdata lost its planted near-dups?"
    assert truth <= cand
    # and LSH must actually prune: far fewer candidates than all pairs
    n = testdata_docs.count()
    assert len(cand) < n * (n - 1) / 20


def test_simhash_near_pairs_exactness(spark, testdata_docs):
    """Block-bucketing must find EVERY pair within the hamming budget (a
    pair ≤3 apart agrees on ≥1 of 4 blocks — pigeonhole), with correct
    distances."""
    sh = {r["docid"]: r["simhash"] for r in simhash(testdata_docs).collect()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sh[a] ^ sh[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {(r["docid_a"], r["docid_b"]): r["hamming"]
           for r in simhash_near_pairs(testdata_docs, max_hamming=3).collect()}
    assert got == want
    assert want, "no near pairs at hamming<=3 — threshold dead"


def test_simhash_near_pairs_non_divisible_bits(spark, testdata_docs):
    """bits % n_blocks != 0: the remainder bits fold into the last block
    (ADVICE round 3) — exactness must hold with uneven block widths too."""
    bits, n_blocks = 50, 7
    sh = {r["docid"]: r["simhash"]
          for r in simhash(testdata_docs, bits).collect()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sh[a] ^ sh[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    got = {(r["docid_a"], r["docid_b"]): r["hamming"]
           for r in simhash_near_pairs(testdata_docs, max_hamming=3,
                                       bits=bits, n_blocks=n_blocks).collect()}
    assert got == want


def _np_embeddings(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def test_cosine_topk_matches_numpy(spark, embeddings):
    ids, mat = _np_embeddings(embeddings)
    norms = np.linalg.norm(mat, axis=1)
    qids = [0, 1, 2]
    got = cosine_topk(embeddings, qids, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    for q in qids:
        qi = np.flatnonzero(ids == q)[0]
        cos = np.round(mat @ mat[qi] / (norms * norms[qi]), 6)
        cos[qi] = -np.inf  # self excluded
        want = sorted(zip(-cos, ids))[:5]
        got_q = sorted(by_q[q])
        for (rank, vid, c), (negc, wid) in zip(got_q, want):
            assert vid == wid and c == pytest.approx(-negc, abs=1e-9)


def test_lsh_ann_subset_of_exact_scores(spark, embeddings):
    """ANN results are exact cosines over a candidate subset: every returned
    neighbor's score must equal the brute-force cosine, and rank order must
    be internally consistent."""
    ids, mat = _np_embeddings(embeddings)
    norms = np.linalg.norm(mat, axis=1)
    got = lsh_ann_topk(embeddings, 64, [0, 1], k=5).collect()
    assert got, "LSH buckets empty — no candidates at all"
    for r in got:
        qi = np.flatnonzero(ids == r["query_id"])[0]
        vi = np.flatnonzero(ids == r["vec_id"])[0]
        true_cos = mat[vi] @ mat[qi] / (norms[vi] * norms[qi])
        assert r["cosine"] == pytest.approx(round(true_cos, 6), abs=1e-9)


def test_ivf_full_probe_equals_brute_force(spark, embeddings):
    """IVF-flat with n_probe = n_centroids degenerates to the exact answer:
    every vector is in SOME probed centroid's list, so the candidate set is
    all of N and the re-rank is brute force."""
    exact = sorted(map(tuple, cosine_topk(embeddings, [0, 1, 2], k=5).collect()))
    ivf = sorted(map(tuple, ivf_ann_topk(embeddings, [0, 1, 2], k=5,
                                         n_centroids=6, n_probe=6).collect()))
    assert ivf == exact and exact


def test_ivf_assignment_is_nearest_centroid(spark, embeddings):
    """Every vector's assigned centroid is its argmax rounded cosine
    (ties → smaller centroid_id), checked against numpy."""
    ids, mat = _np_embeddings(embeddings)
    norms = np.linalg.norm(mat, axis=1)
    cents = {r["centroid_id"]: r["vec_id"]
             for r in ivf_centroid_ids(embeddings, 6).collect()}
    assert len(cents) == 6 and sorted(cents) == list(range(1, 7))
    cidx = {cid: np.flatnonzero(ids == v)[0] for cid, v in cents.items()}
    got = {r["vec_id"]: r["centroid_id"]
           for r in ivf_assign(embeddings, 6).collect()}
    assert set(got) == set(ids.tolist())
    for vec_id, cid in list(got.items())[:100]:
        vi = np.flatnonzero(ids == vec_id)[0]
        best = min(
            ((-round(mat[vi] @ mat[ci] / (norms[vi] * norms[ci]), 6), c)
             for c, ci in cidx.items()))
        assert cid == best[1], (vec_id, cid, best)


def test_ivf_ann_scores_exact_and_recall(spark, embeddings):
    """Partial-probe IVF: every returned cosine is the true cosine, and
    probing more centroids never lowers recall vs the exact top-k."""
    ids, mat = _np_embeddings(embeddings)
    norms = np.linalg.norm(mat, axis=1)
    got = ivf_ann_topk(embeddings, [0, 1], k=5, n_centroids=6,
                       n_probe=2).collect()
    assert got, "IVF probe lists empty"
    for r in got:
        qi = np.flatnonzero(ids == r["query_id"])[0]
        vi = np.flatnonzero(ids == r["vec_id"])[0]
        true_cos = mat[vi] @ mat[qi] / (norms[vi] * norms[qi])
        assert r["cosine"] == pytest.approx(round(true_cos, 6), abs=1e-9)
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(embeddings, [0, 1], k=5).collect()}

    def recall(n_probe):
        g = {(r["query_id"], r["vec_id"])
             for r in ivf_ann_topk(embeddings, [0, 1], k=5, n_centroids=6,
                                   n_probe=n_probe).collect()}
        return len(g & exact) / len(exact)

    r2, r6 = recall(2), recall(6)
    assert r6 == 1.0
    assert r2 <= r6


def test_embedding_near_dup_scores_exact(spark, embeddings):
    got = embedding_near_dup_pairs(embeddings, 64, threshold=0.45,
                                   n_bands=2, n_rows=2).collect()
    ids, mat = _np_embeddings(embeddings)
    norms = np.linalg.norm(mat, axis=1)
    assert got, "near-dup query returned nothing at threshold 0.45 / 2x2 LSH"
    for r in got:
        ai = np.flatnonzero(ids == r["vec_id_a"])[0]
        bi = np.flatnonzero(ids == r["vec_id_b"])[0]
        true_cos = mat[ai] @ mat[bi] / (norms[ai] * norms[bi])
        assert true_cos >= 0.45 - 1e-6
        assert r["cosine"] == pytest.approx(round(true_cos, 6), abs=1e-9)


def test_ivf_trained_centroids_recall_geq_seeded(spark, embeddings):
    """Round 5 (VERDICT #7): the KMeans-trained quantizer plugged into the
    `centroids=` seam must (a) keep every returned cosine exact, (b) reach
    recall ≥ the md5-seeded sample at EQUAL n_probe, and (c) degenerate to
    the brute-force answer at full probe, same as the seeded path."""
    from searchenginepp_spark.operators.similarity import ivf_train_centroids

    qids = [0, 1, 2, 3]
    exact = {(r["query_id"], r["vec_id"])
             for r in cosine_topk(embeddings, qids, k=5).collect()}
    cents = ivf_train_centroids(embeddings, n_centroids=6)
    assert len(cents) == 6 and all(len(c) == len(cents[0]) for c in cents)

    def recall(centroids, n_probe):
        g = {(r["query_id"], r["vec_id"])
             for r in ivf_ann_topk(embeddings, qids, k=5, n_centroids=6,
                                   n_probe=n_probe,
                                   centroids=centroids).collect()}
        return len(g & exact) / len(exact)

    assert recall(cents, 2) >= recall(None, 2)
    assert recall(cents, 6) == 1.0

    # returned cosines stay exact under trained centroids
    ids, mat = _np_embeddings(embeddings)
    norms = np.linalg.norm(mat, axis=1)
    for r in ivf_ann_topk(embeddings, [0], k=5, n_centroids=6, n_probe=2,
                          centroids=cents).collect():
        qi = np.flatnonzero(ids == r["query_id"])[0]
        vi = np.flatnonzero(ids == r["vec_id"])[0]
        true_cos = mat[vi] @ mat[qi] / (norms[vi] * norms[qi])
        assert r["cosine"] == pytest.approx(round(true_cos, 6), abs=1e-9)
