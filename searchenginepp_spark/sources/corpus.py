"""Corpus sources — the engine indexes a source-code table of shape
(repo, path, commit, lang, content) (BASELINE.json input_hint), the Spark
analogue of the reference's stdin TSV `(docno, text)` stream
(/root/reference/src/builder.cpp:33-38).

`docno` is derived as f"{repo}:{path}@{commit}".  docids are assigned
deterministically starting at 1 in (repo, path, commit) order (the reference
assigns them in stdin arrival order starting at 1, builder.cpp:278).

Two docid strategies:
  * window row_number — exact, but single-reducer; test scale only.
  * zip_with_index    — range-partition + sort, per-partition counts, cumsum
                        offsets; fully distributed, the 100 TB path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searchenginepp_spark.config import DOCID_START

CORPUS_COLS = ("repo", "path", "commit", "lang", "content")


def load_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Load an input table and normalize it to the corpus shape.

    Accepts either the native (repo,path,commit,lang,content) shape or the
    driver's synthetic documents table (doc_id,text,lang,source,n_chars),
    which is adapted deterministically (source→repo, doc{id}→path, commit =
    sha2 of the identity, text→content)."""
    df = spark.read.parquet(path)
    cols = set(df.columns)
    if set(CORPUS_COLS) <= cols:
        return df.select(*CORPUS_COLS)
    if {"doc_id", "text"} <= cols:
        return df.select(
            F.col("source").alias("repo"),
            F.format_string("doc%05d.txt", F.col("doc_id").cast("int")).alias("path"),
            F.sha2(F.concat_ws(":", "source", "doc_id"), 256).substr(1, 40).alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
        )
    raise ValueError(f"unrecognized corpus schema: {sorted(cols)}")


def with_docno(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "docno", F.concat_ws("", F.col("repo"), F.lit(":"), F.col("path"),
                             F.lit("@"), F.col("commit"))
    )


def with_content_sha256(df: DataFrame) -> DataFrame:
    """Per-row invariant column (BASELINE.json input_hint): content sha256
    computed at ingest, re-checked from the persisted docmap."""
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))


def assign_docids_window(df: DataFrame, order_cols=("repo", "path", "commit")) -> DataFrame:
    """row_number() docids — exact but funnels through one reducer.
    Use only at test scale; `assign_docids` is the scalable path."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(
        "docid", (F.row_number().over(w) + F.lit(DOCID_START - 1)).cast("long")
    )


def assign_docids(df: DataFrame, order_cols=("repo", "path", "commit"),
                  num_partitions: int | None = None,
                  return_handle: bool = False,
                  start: int | None = None,
                  stats: dict | None = None,
                  stats_aggs: dict | None = None,
                  storage_level=None):
    """Distributed deterministic docid assignment (zipWithIndex as DataFrame).

    1. range-partition + sort by the ordering key (total order across
       partitions),
    2. count rows per partition (cheap agg), cumsum on the driver
       (#partitions values, not #rows),
    3. mapInPandas adds offset + local running index.

    Equivalent to row_number() OVER (ORDER BY order_cols) for a unique key,
    but every stage is distributed — this is the 10^12-row path.

    start: first docid to assign (default DOCID_START) — incremental
    ingestion continues a staged sequence from its base offset.

    storage_level: persist level for the pinned partitioning (default
    MEMORY_AND_DISK).  build_index passes DISK_ONLY when its cache-pressure
    estimator says the corpus cache (measured ≈1.35× the compressed input
    bytes in memory) would thrash executor storage memory.

    stats_aggs: optional {name: Column} extra aggregations evaluated inside
    the per-partition count job (one pass — no extra job) and summed over
    partitions into `stats` — e.g. term_vocab folds sum(length(term)) here
    instead of running a separate agg job (round 6).
    """
    from pyspark.storagelevel import StorageLevel

    order = [F.col(c) for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *order).sortWithinPartitions(*order)
    part = part.withColumn("__pid", F.spark_partition_id())
    # repartitionByRange SAMPLES to pick boundaries — a fresh sample per job.
    # The count job and the assignment job below must see the SAME
    # partitioning, so pin it (memory+disk; a real cluster build would
    # checkpoint to durable storage here — see plans/checkpoint.py).
    part = part.persist(storage_level or StorageLevel.MEMORY_AND_DISK)

    aggs = [F.count("*").alias("count")]
    for name, col in (stats_aggs or {}).items():
        aggs.append(col.alias(f"__agg_{name}"))
    crows = part.groupBy("__pid").agg(*aggs).collect()
    counts = {r["__pid"]: r["count"] for r in crows}
    if stats is not None and stats_aggs:
        for name in stats_aggs:
            stats[name] = sum(r[f"__agg_{name}"] or 0 for r in crows)
    offsets = {}
    acc = DOCID_START if start is None else int(start)
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if stats is not None:
        # total row count falls out of the per-partition count job — callers
        # (e.g. term_vocab) read it here instead of running a second count()
        stats["n_rows"] = sum(counts.values())

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(list(part.schema.fields) + [StructField("docid", LongType())])
    boff = df.sparkSession.sparkContext.broadcast(offsets)

    def add_index(batches):
        # mapInArrow: the content column passes through untouched (no
        # pandas round-trip of the document bodies)
        import numpy as np
        import pyarrow as pa

        local = 0
        base = None
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            if base is None:
                base = boff.value[batch.column("__pid")[0].as_py()]
            ids = pa.array(np.arange(base + local, base + local + n,
                                     dtype=np.int64))
            local += n
            yield batch.append_column("docid", ids)

    out = part.mapInArrow(add_index, schema=schema).drop("__pid")
    if return_handle:
        # caller unpersists `part` when its passes over the corpus are done
        return out, part
    return out


_HEAD_TOKENS = ("int return if else for while void static const include def "
                "class import public new null true false").split()
_PUNCT_TOKENS = ["foo(bar);", "x=y+1;", "a->b", '"str,lit"', "/*comment*/", "don't"]
_ENGLISH_TOKENS = ["the", "and", "from", "use", "twinkle", "little", "wonder", "world"]
_EXTS = {"c": "c", "cpp": "cc", "py": "py", "java": "java", "js": "js"}


def make_synthetic_row(i: int, seed: int = 42) -> tuple[str, str, str, str, str]:
    """Deterministic FIXTURES.md §1 recipe for row i — head-skew code
    tokens, punctuation-bearing tokens, stopword/stemmable English words."""
    import hashlib
    import random

    rng = random.Random(f"{seed}:{i}")
    langs = list(_EXTS)
    repo = f"org{i % 7}/repo{i % 23}"
    lang = langs[i % 5]
    path = f"src/dir{i % 11}/file{i}.{_EXTS[lang]}"
    commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
    n_tok = rng.randint(50, 300)
    toks = []
    for _ in range(n_tok):
        r = rng.random()
        if r < 0.35:
            toks.append(_HEAD_TOKENS[min(int(rng.expovariate(0.35)), len(_HEAD_TOKENS) - 1)])
        elif r < 0.75:
            toks.append(f"sym{rng.randint(0, 999)}")
        elif r < 0.85:
            toks.append(f"fn_{rng.randint(0, 499)}")
        elif r < 0.93:
            toks.append(rng.choice(_PUNCT_TOKENS))
        else:
            toks.append(rng.choice(_ENGLISH_TOKENS))
    return (repo, path, commit, lang, " ".join(toks))


def synthesize_corpus(spark: SparkSession, n_docs: int, seed: int = 42,
                      num_partitions: int = 8) -> DataFrame:
    """Deterministic synthetic source-code corpus (input_hint shape), built
    on the driver. For large n use synthesize_corpus_distributed."""
    rows = [make_synthetic_row(i, seed) for i in range(n_docs)]
    return spark.createDataFrame(
        rows,
        schema="repo string, path string, commit string, lang string, content string",
    ).repartition(num_partitions)


def synthesize_corpus_distributed(spark: SparkSession, n_docs: int,
                                  seed: int = 42,
                                  num_partitions: int | None = None) -> DataFrame:
    """Same rows as synthesize_corpus, generated on executors — the bench
    path (row i is deterministic in i alone, so distribution is safe)."""
    n_part = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_synthetic_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"])

    return spark.range(0, n_docs, numPartitions=n_part).mapInPandas(
        gen,
        schema="repo string, path string, commit string, lang string, content string",
    )
