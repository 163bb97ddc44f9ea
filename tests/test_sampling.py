"""Deterministic stratified sampling — the properties a resumable 100 TB
dataset build needs: the kept set is a pure function of docid (invariant
under repartitioning and row order), per-stratum caps are exact, and
fractions land near their targets."""

import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.sampling import (
    stratified_sample_cap, stratified_sample_fraction,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "docid long, lang string")


def test_fraction_sampler_is_partitioning_invariant(docs):
    frac = {"en": 0.3, "de": 0.7}
    a = stratified_sample_fraction(docs, "lang", frac, 0.1)
    b = stratified_sample_fraction(
        docs.repartition(13, "lang").sortWithinPartitions(F.desc("docid")),
        "lang", frac, 0.1)
    ra = sorted(r["docid"] for r in a.collect())
    rb = sorted(r["docid"] for r in b.collect())
    assert ra == rb and len(ra) > 0


def test_fraction_sampler_hits_targets(docs):
    got = (stratified_sample_fraction(docs, "lang",
                                      {"en": 0.3, "de": 0.7}, 0.0)
           .groupBy("lang").count().collect())
    by_lang = {r["lang"]: r["count"] for r in got}
    assert "zh" not in by_lang                   # default 0 drops the stratum
    assert abs(by_lang["en"] / 1000 - 0.3) < 0.06   # md5 is uniform enough
    assert abs(by_lang["de"] / 1000 - 0.7) < 0.06


def test_cap_sampler_exact_counts_and_determinism(docs):
    cap = 37
    a = stratified_sample_cap(docs, "lang", cap)
    counts = {r["lang"]: r["count"]
              for r in a.groupBy("lang").count().collect()}
    assert counts == {"en": cap, "de": cap, "zh": cap}
    ranks = {r["lang"]: sorted(x["sample_rank"] for x in rows)
             for r in a.select("lang").distinct().collect()
             for rows in [a.where(F.col("lang") == r["lang"]).collect()]}
    assert all(v == list(range(1, cap + 1)) for v in ranks.values())
    b = stratified_sample_cap(docs.repartition(7), "lang", cap)
    assert sorted(r["docid"] for r in a.collect()) == \
        sorted(r["docid"] for r in b.collect())


def test_cap_larger_than_stratum_keeps_all(spark):
    docs = spark.createDataFrame([(i, "en") for i in range(5)],
                                 "docid long, lang string")
    out = stratified_sample_cap(docs, "lang", 100).collect()
    assert len(out) == 5
