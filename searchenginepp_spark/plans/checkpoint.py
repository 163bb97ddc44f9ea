"""Checkpointed, resumable index build with per-partition lineage + metrics.

The reference builder is a single process whose only recovery story is
"re-run from stdin" (/root/reference/src/builder.cpp:294-341).  At 10^12
files a killed build must NOT recompute finished work, so this plan splits
the one wide term shuffle into `n_buckets` independent term-hash buckets and
checkpoints each to durable storage with its own manifest entry — lineage
(input snapshot + config fingerprint) and throughput metrics (postings/sec)
per bucket.  A restart replays the manifest, validates fingerprints, and
runs only the buckets that are missing.

Stages (each idempotent, each recorded in manifest.json):
  postings   docid assignment + tokenize → postings parquet partitioned by
             bucket = pmod(xxhash64(term), n_buckets), plus the docmap.
             This is the expensive pass (the tokenizer UDF touches every
             byte of the corpus) and runs exactly once.
  stats      n_docs / sum_doclen (reference metadata, builder.cpp:177-181).
  lexicon    global df per term (reference global-lexicon k-way merge,
             builder.cpp:127-170).
  bucket:<i> encode + sigma/skip for bucket i → {shards}/bucket=<i>/.
             Reading the root path later partition-discovers the bucket
             column; query paths are unchanged.
  complete   terminal marker.

Scale note: bucket granularity bounds lost work to (total / n_buckets); at
cluster scale pick n_buckets ≈ a few × executor count.  Within a bucket the
normal salted-shard shuffle of index_build.build_index_shards still applies,
so head-term skew is handled at BOTH levels.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searchenginepp_spark.config import SKIP_BLOCK_SIZE
from searchenginepp_spark.operators.index_build import (
    SALT_TARGET_POSTINGS, IndexPaths, build_index_shards, build_stats,
    doclen_udf, explode_postings,
)
from searchenginepp_spark.sources.corpus import (
    assign_docids, with_content_sha256, with_docno,
)

MANIFEST_NAME = "manifest.json"


class BuildKilled(RuntimeError):
    """Injected failure for the kill/restart test."""


def _manifest_path(paths: IndexPaths) -> str:
    return os.path.join(paths.manifest, MANIFEST_NAME)


def load_manifest(paths: IndexPaths) -> dict:
    p = _manifest_path(paths)
    if not os.path.exists(p):
        return {"stages": {}}
    with open(p) as f:
        return json.load(f)


def _save_manifest(paths: IndexPaths, manifest: dict) -> None:
    os.makedirs(paths.manifest, exist_ok=True)
    tmp = _manifest_path(paths) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(paths))


def config_fingerprint(**kwargs) -> str:
    import hashlib

    return hashlib.sha256(
        json.dumps(kwargs, sort_keys=True).encode()).hexdigest()[:16]


def _stage_done(manifest: dict, name: str, fingerprint: str) -> bool:
    ent = manifest["stages"].get(name)
    return bool(ent) and ent.get("fingerprint") == fingerprint


def _record(manifest: dict, paths: IndexPaths, name: str, fingerprint: str,
            **metrics) -> None:
    manifest["stages"][name] = {
        "fingerprint": fingerprint,
        "completed_at": time.time(),
        **metrics,
    }
    _save_manifest(paths, manifest)


def build_index_resumable(spark: SparkSession, corpus: DataFrame,
                          out: str | IndexPaths, stem: bool = True,
                          n_buckets: int = 16,
                          salt_target: int = SALT_TARGET_POSTINGS,
                          block_size: int = SKIP_BLOCK_SIZE,
                          term_partitions: int | None = None,
                          fail_after_buckets: int | None = None) -> IndexPaths:
    """Resumable build_index.  Re-invoking after a crash (same out dir, same
    config) skips every completed stage; a config change invalidates the
    fingerprint and recomputes.  `fail_after_buckets` injects a crash after
    that many bucket stages complete in THIS invocation (tests only)."""
    paths = out if isinstance(out, IndexPaths) else IndexPaths(out)
    fp = config_fingerprint(stem=stem, n_buckets=n_buckets,
                            salt_target=salt_target, block_size=block_size)
    manifest = load_manifest(paths)
    postings_path = f"{paths.root}/postings_ckpt"

    # ---- stage: postings (tokenize once; docids frozen at checkpoint) ----
    if not _stage_done(manifest, "postings", fp):
        t0 = time.perf_counter()
        prepared, cache_handle = assign_docids(
            with_content_sha256(with_docno(corpus)), return_handle=True)
        try:
            (prepared.withColumn("doclen", doclen_udf(stem)(F.col("content")))
             .select("docid", "docno", "repo", "path", "commit", "lang",
                     "doclen", "content_sha256")
             .write.mode("overwrite").parquet(paths.docmap))
            postings = explode_postings(prepared, stem=stem).withColumn(
                "bucket",
                F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
            (postings.write.mode("overwrite")
             .partitionBy("bucket").parquet(postings_path))
        finally:
            cache_handle.unpersist()
        wall = time.perf_counter() - t0
        n_postings = spark.read.parquet(postings_path).count()
        n_docs = spark.read.parquet(paths.docmap).count()
        _record(manifest, paths, "postings", fp,
                lineage={"postings_path": postings_path,
                         "docmap_path": paths.docmap},
                n_docs=n_docs, n_postings=n_postings, wall_s=round(wall, 3),
                postings_per_sec=round(n_postings / wall, 1) if wall else None)

    # ---- stage: stats + lexicon (cheap aggs over the checkpoint) ----
    if not _stage_done(manifest, "stats", fp):
        t0 = time.perf_counter()
        build_stats(spark.read.parquet(paths.docmap)).write.mode(
            "overwrite").parquet(paths.stats)
        _record(manifest, paths, "stats", fp,
                wall_s=round(time.perf_counter() - t0, 3))
    if not _stage_done(manifest, "lexicon", fp):
        t0 = time.perf_counter()
        (spark.read.parquet(postings_path).groupBy("term")
         .agg(F.count("*").alias("df"))
         .write.mode("overwrite").parquet(paths.lexicon))
        _record(manifest, paths, "lexicon", fp,
                wall_s=round(time.perf_counter() - t0, 3))

    srow = spark.read.parquet(paths.stats).collect()[0]
    n_docs = int(srow["n_docs"])
    avgdl = (srow["sum_doclen"] / n_docs) if n_docs else 0.0

    # ---- per-bucket encode stages (skip/σ metadata fused into encode) ----
    # Purge shard dirs not owned by a completed stage of THIS config: a
    # config change (e.g. fewer n_buckets) leaves stale bucket=<i> dirs that
    # partition discovery on the shards root would read alongside the
    # rebuilt ones — duplicated postings inconsistent with the new lexicon
    # (ADVICE round 1).  Dirs owned by a valid completed stage are kept.
    import shutil

    if os.path.isdir(paths.shards):
        for d in os.listdir(paths.shards):
            if not d.startswith("bucket="):
                continue
            try:
                i = int(d.split("=", 1)[1])
            except ValueError:
                continue
            if i >= n_buckets or not _stage_done(manifest, f"bucket:{i}", fp):
                shutil.rmtree(os.path.join(paths.shards, d),
                              ignore_errors=True)

    done_this_run = 0
    for b in range(n_buckets):
        name = f"bucket:{b}"
        if _stage_done(manifest, name, fp):
            continue
        if fail_after_buckets is not None and done_this_run >= fail_after_buckets:
            raise BuildKilled(f"injected kill before {name}")
        t0 = time.perf_counter()
        bucket_postings = (
            spark.read.parquet(postings_path)
            .filter(F.col("bucket") == b)       # partition-pruned scan
            .select("term", "docid", "tf", "doclen")
        )
        shards = build_index_shards(bucket_postings, float(avgdl),
                                    salt_target=salt_target,
                                    num_partitions=term_partitions,
                                    block_size=block_size)
        out_dir = f"{paths.shards}/bucket={b}"
        shards.write.mode("overwrite").parquet(out_dir)
        wall = time.perf_counter() - t0
        stats_row = (spark.read.parquet(out_dir)
                     .agg(F.count("*").alias("rows"),
                          F.sum("df_shard").alias("postings")).collect()[0])
        n_post = int(stats_row["postings"] or 0)
        _record(manifest, paths, name, fp,
                lineage={"input": postings_path, "bucket": b, "output": out_dir},
                n_shard_rows=int(stats_row["rows"]), n_postings=n_post,
                wall_s=round(wall, 3),
                postings_per_sec=round(n_post / wall, 1) if wall else None)
        done_this_run += 1

    if not _stage_done(manifest, "complete", fp):
        _record(manifest, paths, "complete", fp, n_buckets=n_buckets)
    return paths
