"""Deterministic stratified sampling for training-data pipelines.

Samplers here are HASH-based, not RNG-based: a doc's fate depends only on
its docid (md5-prefix uniform), so the sample is reproducible across runs,
engines (the DuckDB oracle computes the identical expression), cluster
sizes and partitionings — the property a 100 TB pipeline needs for
resumable / auditable dataset builds.  Spark's own df.sample() is
per-partition RNG and none of those things.

Two shapes:
  * stratified_sample_fraction — keep a per-stratum fraction.  Map-only
    (one predicate per row, no shuffle): the scale path.
  * stratified_sample_cap — keep exactly min(cap, |stratum|) docs per
    stratum, chosen by hash order (a deterministic reservoir).  One window
    per stratum; at 100 TB a giant stratum funnels through one task, so
    for web-scale strata first cut with the fraction sampler to ~2-3x the
    cap, then apply the exact cap to the survivors (two-phase trim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# md5-prefix → 60-bit uniform integer; / 2^60 → uniform [0, 1).  The same
# expression is SQL: ('0x' || substr(md5(docid::VARCHAR), 1, 15))::BIGINT.
_HASH_SPAN = float(1 << 60)


def _hash_u01(docid: Column) -> Column:
    return (F.conv(F.substring(F.md5(docid.cast("string")), 1, 15), 16, 10)
            .cast("long") / F.lit(_HASH_SPAN))


def stratified_sample_fraction(docs: DataFrame, strata_col: str,
                               fractions: dict[str, float],
                               default_fraction: float = 0.0) -> DataFrame:
    """Rows of `docs` whose hash-uniform u(docid) < fraction(stratum).
    Strata missing from `fractions` get default_fraction (0 = drop).
    Map-only; the sample is a fixed subset of the input regardless of
    partitioning, cluster size, or row order."""
    frac = F.lit(default_fraction)
    for key, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == key, F.lit(float(f))).otherwise(frac)
    return docs.where(_hash_u01(F.col("docid")) < frac)


def stratified_sample_cap(docs: DataFrame, strata_col: str,
                          cap: int) -> DataFrame:
    """Exactly min(cap, |stratum|) rows per stratum, ranked by
    (hash(docid), docid) — a deterministic reservoir.  Adds `sample_rank`
    (1-based within the stratum).  One window shuffle keyed by the stratum;
    see the module docstring for the two-phase trim at web-scale strata."""
    w = (Window.partitionBy(strata_col)
         .orderBy(_hash_u01(F.col("docid")).asc(), F.col("docid").asc()))
    return (docs.withColumn("sample_rank",
                            F.row_number().over(w).cast("long"))
            .where(F.col("sample_rank") <= cap))
