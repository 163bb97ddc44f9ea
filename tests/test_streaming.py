"""Structured Streaming: (1) the windowed event agg gives identical answers
in batch and streaming (availableNow) modes; (2) the incremental index
ingest is exactly-once across stream restarts and its final index answers
queries identically to a one-shot batch build."""

import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.bmm import search_bmm
from searchenginepp_spark.operators.index_build import build_index
from searchenginepp_spark.operators.query import search
from searchenginepp_spark.sources.corpus import synthesize_corpus
from searchenginepp_spark.streaming.incremental import (
    finalize_index, start_ingest,
)
from searchenginepp_spark.streaming.windowed import (
    stream_event_counts, windowed_event_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_windowed_agg_stream_equals_batch(spark, tmp_path):
    batch = windowed_event_counts(spark.read.parquet(EVENTS))
    want = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in batch.collect()}
    assert want, "events table empty?"

    # file-stream sources want a directory, not a single parquet file
    events_dir = str(tmp_path / "events_dir")
    spark.read.parquet(EVENTS).write.parquet(events_dir)
    sdf = stream_event_counts(spark, events_dir, str(tmp_path / "ckpt"))
    q = (sdf.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in spark.sql("SELECT * FROM win_counts").collect()}
    assert got == want


QUERIES = [(1, "sym1 sym2"), (2, "int return"), (3, "fn_1 sym5")]


def _by_docno(df):
    return sorted((r["qid"], r["docno"], round(r["score"], 6))
                  for r in df.collect())


def test_incremental_ingest_exactly_once_and_matches_batch(spark, tmp_path):
    corpus = synthesize_corpus(spark, 120).cache()
    wave1 = corpus.filter(F.crc32("path") % 2 == 0)
    wave2 = corpus.filter(F.crc32("path") % 2 == 1)
    in_dir = str(tmp_path / "arrivals")
    staging = str(tmp_path / "staging")

    # wave 1 arrives, stream drains it
    wave1.write.mode("append").parquet(in_dir)
    start_ingest(spark, in_dir, staging, available_now=True)
    n1 = spark.read.parquet(f"{staging}/staging_docmap").count()
    assert n1 == wave1.count()

    # re-running with nothing new is a no-op (checkpoint, not re-ingest)
    start_ingest(spark, in_dir, staging, available_now=True)
    assert spark.read.parquet(f"{staging}/staging_docmap").count() == n1

    # wave 2 arrives; only the new files are processed
    wave2.write.mode("append").parquet(in_dir)
    start_ingest(spark, in_dir, staging, available_now=True)
    docmap = spark.read.parquet(f"{staging}/staging_docmap")
    assert docmap.count() == 120
    # docids stayed dense and unique across micro-batches
    assert docmap.select("docid").distinct().count() == 120
    assert docmap.agg(F.min("docid"), F.max("docid")).collect()[0] == (1, 120)

    # finalize → same answers as a one-shot batch build (docids differ by
    # arrival order, so compare by docno)
    inc = finalize_index(spark, staging, str(tmp_path / "inc_index"),
                         salt_target=64, block_size=16)
    batch_root = str(tmp_path / "batch_index")
    build_index(spark, corpus, batch_root, salt_target=64, block_size=16)
    got = _by_docno(search(spark, inc.root, QUERIES, k=10))
    want = _by_docno(search(spark, batch_root, QUERIES, k=10))
    assert got == want


def test_stage_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a micro-batch with the same
    batch_id (crash between staging write and checkpoint commit) must leave
    the staging tables byte-identical — same rows, same docids (ADVICE
    round 1)."""
    from searchenginepp_spark.streaming.incremental import (
        StagingPaths, _stage_batch, read_staged_docmap, read_staged_postings,
    )

    corpus = synthesize_corpus(spark, 40)
    b1 = corpus.filter(F.col("path").substr(-5, 1).isin("0", "1", "2"))
    b2 = corpus.subtract(b1)
    staging = StagingPaths(str(tmp_path / "staging"))

    _stage_batch(spark, b1, 0, staging, stem=True)
    snap1 = sorted(map(tuple, read_staged_docmap(spark, staging).collect()))
    _stage_batch(spark, b1, 0, staging, stem=True)      # replay batch 0
    assert sorted(map(tuple,
                      read_staged_docmap(spark, staging).collect())) == snap1

    _stage_batch(spark, b2, 1, staging, stem=True)
    full = read_staged_docmap(spark, staging)
    n = corpus.count()
    assert full.count() == n
    assert full.select("docid").distinct().count() == n
    lo, hi = full.agg(F.min("docid"), F.max("docid")).collect()[0]
    assert (lo, hi) == (1, n)
    post1 = sorted(map(tuple, read_staged_postings(spark, staging).collect()))
    _stage_batch(spark, b2, 1, staging, stem=True)      # replay batch 1
    assert sorted(map(tuple,
                      read_staged_postings(spark, staging).collect())) == post1


def test_half_staged_batch_surfaces_clear_error(spark, tmp_path):
    """ADVICE round 3: a batch whose docmap committed without its postings
    (possible only in staging written by the old docmap-first order) must
    fail finalize/refresh with a clear message, not KeyError / a silently
    term-less fold."""
    import shutil

    import pytest

    from searchenginepp_spark.streaming.incremental import (
        StagingPaths, _stage_batch, refresh_index,
    )

    corpus = synthesize_corpus(spark, 30)
    staging = StagingPaths(str(tmp_path / "staging"))
    _stage_batch(spark, corpus, 0, staging, stem=True)
    # simulate the legacy crash: postings of batch 0 vanish, docmap stays
    shutil.rmtree(f"{staging.postings}/batch=0")
    with pytest.raises(RuntimeError, match="half-staged"):
        finalize_index(spark, staging.root, str(tmp_path / "idx"))
    prev = str(tmp_path / "prev_idx")
    build_index(spark, synthesize_corpus(spark, 10), prev,
                salt_target=64, block_size=16)
    with pytest.raises(RuntimeError, match="half-staged"):
        refresh_index(spark, staging.root, str(tmp_path / "idx2"),
                      prev_root=prev)


def test_orphan_postings_dir_is_ignored_by_finalize(spark, tmp_path):
    """The inverse crash (postings committed, docmap not — possible with the
    new postings-first order): finalize must EXCLUDE the orphan's postings,
    since its docs are absent from docmap/stats and the stream will replay
    the batch."""
    import shutil

    from searchenginepp_spark.streaming.incremental import (
        StagingPaths, _stage_batch,
    )

    corpus = synthesize_corpus(spark, 40)
    b1 = corpus.filter(F.crc32("path") % 2 == 0)
    b2 = corpus.subtract(b1)
    staging = StagingPaths(str(tmp_path / "staging"))
    _stage_batch(spark, b1, 0, staging, stem=True)
    _stage_batch(spark, b2, 1, staging, stem=True)
    shutil.rmtree(f"{staging.docmap}/batch=1")      # crash before docmap
    idx = finalize_index(spark, staging.root, str(tmp_path / "idx"))
    n1 = b1.count()
    assert spark.read.parquet(idx.docmap).count() == n1
    # no postings from the orphan batch leaked into the shard table
    max_docid = spark.read.parquet(idx.shards).agg(
        F.max("last_docid")).collect()[0][0]
    assert max_docid <= n1


def test_refresh_index_incremental_folding(spark, tmp_path):
    """refresh_index folds ONLY newly staged batches into a delta segment
    and merges it metadata-only with the previous index: results equal a
    from-scratch batch build over everything ingested so far."""
    from searchenginepp_spark.streaming.incremental import refresh_index

    corpus = synthesize_corpus(spark, 150).cache()
    wave1 = corpus.filter(F.crc32("path") % 3 != 0)
    wave2 = corpus.subtract(wave1)
    in_dir = str(tmp_path / "arrivals")
    staging = str(tmp_path / "staging")

    wave1.write.mode("append").parquet(in_dir)
    start_ingest(spark, in_dir, staging, available_now=True)
    idx1 = str(tmp_path / "idx1")
    refresh_index(spark, staging, idx1, salt_target=64, block_size=16)
    n1 = spark.read.parquet(f"{idx1}/docmap").count()
    assert n1 == wave1.count()

    wave2.write.mode("append").parquet(in_dir)
    start_ingest(spark, in_dir, staging, available_now=True)
    idx2 = str(tmp_path / "idx2")
    refresh_index(spark, staging, idx2, prev_root=idx1,
                  salt_target=64, block_size=16)
    assert spark.read.parquet(f"{idx2}/docmap").count() == 150

    batch_root = str(tmp_path / "batch")
    build_index(spark, corpus, batch_root, salt_target=64, block_size=16)
    got = _by_docno(search(spark, idx2, QUERIES, k=1000))
    want = _by_docno(search(spark, batch_root, QUERIES, k=1000))
    assert got == want
    # BMM stays sound on the refreshed (multi-segment) index
    got_bmm = _by_docno(search_bmm(spark, idx2, QUERIES, k=10))
    assert got_bmm == _by_docno(search(spark, idx2, QUERIES, k=10))

    # a third refresh with nothing new is a copy, not a rebuild
    idx3 = str(tmp_path / "idx3")
    refresh_index(spark, staging, idx3, prev_root=idx2,
                  salt_target=64, block_size=16)
    assert _by_docno(search(spark, idx3, QUERIES, k=10)) == \
        _by_docno(search(spark, idx2, QUERIES, k=10))


def test_refresh_after_finalize_and_manifest_contract(spark, tmp_path):
    """finalize_index now records its folded batch ids, so refresh_index can
    take a finalize-produced index as prev_root (previously a
    FileNotFoundError, ADVICE round 2); the delta temp segment is cleaned
    up after the merge."""
    import glob
    import json

    from searchenginepp_spark.streaming.incremental import refresh_index

    corpus = synthesize_corpus(spark, 140).cache()
    wave1 = corpus.filter(F.crc32("path") % 3 != 0)
    wave2 = corpus.subtract(wave1)
    in_dir = str(tmp_path / "arrivals")
    staging = str(tmp_path / "staging")

    wave1.write.mode("append").parquet(in_dir)
    start_ingest(spark, in_dir, staging, available_now=True)
    idx1 = finalize_index(spark, staging, str(tmp_path / "idx1"),
                          salt_target=64, block_size=16)
    with open(f"{idx1.root}/manifest/folded_batches.json") as f:
        assert json.load(f)["batches"] == [0]

    wave2.write.mode("append").parquet(in_dir)
    start_ingest(spark, in_dir, staging, available_now=True)
    before = set(glob.glob("/tmp/sepp_delta_*"))
    idx2 = refresh_index(spark, staging, str(tmp_path / "idx2"),
                         prev_root=idx1.root, salt_target=64, block_size=16)
    assert set(glob.glob("/tmp/sepp_delta_*")) == before  # temp dir removed
    assert spark.read.parquet(f"{idx2.root}/docmap").count() == 140

    batch_root = str(tmp_path / "batch")
    build_index(spark, corpus, batch_root, salt_target=64, block_size=16)
    got = _by_docno(search(spark, idx2.root, QUERIES, k=1000))
    want = _by_docno(search(spark, batch_root, QUERIES, k=1000))
    assert got == want


def test_refresh_auto_compaction_bounds_fragmentation(spark, tmp_path):
    """Each refresh appends one segment; with auto_compact_segments=2 the
    third fold must trigger a compaction that (a) collapses per-term
    sub-list rows back to the fresh-build shape, (b) resets the manifest
    segment counter, and (c) keeps results rank-identical to a one-shot
    batch build (VERDICT round 2 #6)."""
    import json

    from searchenginepp_spark.streaming.incremental import refresh_index

    corpus = synthesize_corpus(spark, 160).cache()
    waves = [corpus.filter(F.crc32("path") % 4 == i) for i in range(4)]
    in_dir = str(tmp_path / "arrivals")
    staging = str(tmp_path / "staging")

    prev = None
    for i, wave in enumerate(waves):
        wave.write.mode("append").parquet(in_dir)
        start_ingest(spark, in_dir, staging, available_now=True)
        out = str(tmp_path / f"idx{i}")
        refresh_index(spark, staging, out, prev_root=prev,
                      salt_target=64, block_size=16,
                      auto_compact_segments=2)
        with open(f"{out}/manifest/folded_batches.json") as f:
            m = json.load(f)
        # folds: i=0 finalize (1 seg), i=1 merge (2 segs), i=2 compact
        # (reset to 1), i=3 merge (2 segs)
        assert m["n_segments"] == [1, 2, 1, 2][i], (i, m)
        prev = out

    batch_root = str(tmp_path / "batch")
    build_index(spark, corpus, batch_root, salt_target=64, block_size=16)

    # per-term fragmentation stays bounded: the final index holds ≤2
    # segments (compaction reset at i=2), so a term may carry at most
    # 2× the fresh-build's per-term row count — NOT 4 segments' worth
    def max_rows_per_term(root):
        return (spark.read.parquet(f"{root}/index_shards")
                .groupBy("term").count().agg(F.max("count")).collect()[0][0])

    assert max_rows_per_term(prev) <= 2 * max_rows_per_term(batch_root)
    got = _by_docno(search(spark, prev, QUERIES, k=1000))
    want = _by_docno(search(spark, batch_root, QUERIES, k=1000))
    assert got == want
    assert _by_docno(search_bmm(spark, prev, QUERIES, k=10)) == \
        _by_docno(search(spark, prev, QUERIES, k=10))


def test_orphan_postings_with_no_committed_docmap_yields_empty_index(
        spark, tmp_path):
    """ADVICE round 4: crash after the very FIRST batch's postings write
    (no docmap batch committed at all) must finalize to an EMPTY index —
    not fold the orphaned postings into an index whose stats say
    n_docs=0."""
    import shutil

    from searchenginepp_spark.streaming.incremental import (
        StagingPaths, _stage_batch,
    )

    corpus = synthesize_corpus(spark, 20)
    staging = StagingPaths(str(tmp_path / "staging"))
    _stage_batch(spark, corpus, 0, staging, stem=True)
    shutil.rmtree(f"{staging.docmap}/batch=0")      # crash before docmap
    idx = finalize_index(spark, staging.root, str(tmp_path / "idx"))
    assert spark.read.parquet(idx.docmap).count() == 0
    assert spark.read.parquet(idx.shards).count() == 0
    stats = spark.read.parquet(idx.stats).collect()[0]
    assert stats["n_docs"] == 0
