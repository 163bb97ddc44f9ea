"""Incremental index ingestion — Structured Streaming over an arriving
corpus directory.

The reference builder re-runs from scratch for new documents; here new
corpus files landing in a directory are picked up by a parquet file stream,
tokenized per micro-batch (foreachBatch), and staged as relational postings
+ docmap appends.  The stream checkpoint guarantees each file is processed
exactly once across restarts — `finalize_index` then compacts the staging
tables into the same compressed shard layout the batch builder produces, so
the query paths (exact and BMM) work unchanged.

Docid strategy: each micro-batch enumerates its docs from a base offset =
max staged docid (monotonic, batch-serial — micro-batches of one stream
never overlap).  Arrival order replaces the reference's stdin order as the
docid authority (builder.cpp:278 semantics, stream edition).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchenginepp_spark.config import SKIP_BLOCK_SIZE
from searchenginepp_spark.operators.index_build import (
    SALT_TARGET_POSTINGS, IndexPaths, build_index_shards, build_stats,
    doclen_udf, explode_postings,
)
from searchenginepp_spark.sources.corpus import (
    CORPUS_COLS, with_content_sha256, with_docno,
)


class StagingPaths:
    def __init__(self, root: str):
        self.root = root
        self.postings = f"{root}/staging_postings"
        self.docmap = f"{root}/staging_docmap"
        self.checkpoint = f"{root}/stream_checkpoint"


def _stage_batch(spark: SparkSession, batch: DataFrame, staging: StagingPaths,
                 stem: bool) -> None:
    if not batch.head(1):
        return
    base = 0
    if os.path.isdir(staging.docmap):
        row = spark.read.parquet(staging.docmap).agg(
            F.max("docid").alias("m")).collect()[0]
        base = int(row["m"] or 0)
    # deterministic within-batch order; offset continues the staged sequence
    from pyspark.sql import Window

    w = Window.orderBy("repo", "path", "commit")
    prepared = with_content_sha256(with_docno(batch)).withColumn(
        "docid", (F.row_number().over(w) + F.lit(base)).cast("long"))
    (prepared.withColumn("doclen", doclen_udf(stem)(F.col("content")))
     .select("docid", "docno", "repo", "path", "commit", "lang", "doclen",
             "content_sha256")
     .write.mode("append").parquet(staging.docmap))
    explode_postings(prepared, stem=stem).write.mode("append").parquet(
        staging.postings)


def start_ingest(spark: SparkSession, corpus_dir: str, staging_root: str,
                 stem: bool = True, available_now: bool = True):
    """Start the file-stream ingestion. With available_now the query drains
    everything currently in `corpus_dir` and stops; re-invoking later
    processes only files that arrived since (checkpointed)."""
    staging = StagingPaths(staging_root)
    schema = spark.read.parquet(corpus_dir).schema
    stream = (spark.readStream.schema(schema).parquet(corpus_dir)
              .select(*CORPUS_COLS))

    writer = (
        stream.writeStream
        .foreachBatch(lambda b, _id: _stage_batch(spark, b, staging, stem))
        .option("checkpointLocation", staging.checkpoint)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return staging
    return writer.start()


def finalize_index(spark: SparkSession, staging_root: str, out: str,
                   salt_target: int = SALT_TARGET_POSTINGS,
                   block_size: int = SKIP_BLOCK_SIZE,
                   term_partitions: int | None = None) -> IndexPaths:
    """Compact the staged postings/docmap into the standard index layout —
    identical to what build_index writes, so search()/search_bmm() just
    work."""
    staging = StagingPaths(staging_root)
    paths = IndexPaths(out)
    docmap = spark.read.parquet(staging.docmap)
    docmap.write.mode("overwrite").parquet(paths.docmap)

    build_stats(docmap).write.mode("overwrite").parquet(paths.stats)
    srow = spark.read.parquet(paths.stats).collect()[0]
    n_docs = int(srow["n_docs"])
    avgdl = (srow["sum_doclen"] / n_docs) if n_docs else 0.0

    postings = spark.read.parquet(staging.postings)
    shards = build_index_shards(postings, float(avgdl),
                                salt_target=salt_target,
                                num_partitions=term_partitions,
                                block_size=block_size)
    shards.write.mode("overwrite").parquet(paths.shards)
    (spark.read.parquet(paths.shards)
     .groupBy("term").agg(F.sum("df_shard").alias("df"))
     .write.mode("overwrite").parquet(paths.lexicon))
    return paths
