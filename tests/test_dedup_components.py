"""connected_components / dedup_components — transitive near-dup groups.

Reference: a Python union-find over the same pairs.  Exercises multi-round
convergence (long chains), singletons, empty pair sets, and the canonical
flag.  The pair graph is what every candidate generator in dedup.py emits;
components are what a keep-one-per-cluster dedup step actually consumes."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.dedup import (
    connected_components, dedup_components,
)


def _union_find(n_nodes, pairs):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min docid in component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    out = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _check(spark, n_nodes, pairs):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "docid long")
    pdf = spark.createDataFrame(pairs or [(0, 0)],
                                "docid_a long, docid_b long")
    if not pairs:
        pdf = pdf.filter(F.lit(False))
    got = {r["docid"]: r["component"]
           for r in connected_components(pdf, nodes).collect()}
    want = _union_find(n_nodes, pairs)
    assert got == want


def test_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(42)
    n = 200
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(80, 2))
             if a != b]
    pairs = [(min(a, b), max(a, b)) for a, b in pairs]
    _check(spark, n, pairs)


def test_long_chain_needs_multiple_rounds(spark):
    # path graph 0-1-2-...-39: diameter 39 forces many propagation rounds
    pairs = [(i, i + 1) for i in range(39)]
    _check(spark, 50, pairs)   # 40-node chain + 10 singletons


def test_empty_pairs_all_singletons(spark):
    _check(spark, 12, [])


def test_max_iter_raises_before_convergence(spark):
    nodes = spark.createDataFrame([(i,) for i in range(10)], "docid long")
    pairs = spark.createDataFrame([(i, i + 1) for i in range(9)],
                                  "docid_a long, docid_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, nodes, max_iter=2)


def test_dedup_components_canonical_flag(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(6)],
                                 "docid long, content string")
    pairs = spark.createDataFrame([(0, 3), (3, 5)],
                                  "docid_a long, docid_b long")
    rows = {r["docid"]: (r["component"], r["is_canonical"])
            for r in dedup_components(docs, pairs).collect()}
    assert rows == {0: (0, 1), 1: (1, 1), 2: (2, 1),
                    3: (0, 0), 4: (4, 1), 5: (0, 0)}
