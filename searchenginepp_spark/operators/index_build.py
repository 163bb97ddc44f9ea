"""Index construction — the Spark-first re-expression of the reference
builder pipeline (/root/reference/src/builder.cpp:270-374):

  corpus → tokenize (Arrow UDF, map<term,tf> per doc; B4-B9)
         → explode → postings (term, docid, tf, doclen)        [narrow]
         → salted repartition by term hash → encode shards     [1 shuffle]
         → global lexicon / stats aggregations                 [tiny shuffles]
         → sigma/skip second pass (map-only + broadcast stats) [no shuffle]

Scale design:
  * ONE wide shuffle of the exploded postings, keyed by (term, salt). Head
    terms (df above SALT_TARGET_POSTINGS, e.g. 'int'/'return' in code) are
    split into ceil(df/target) docid-hashed sub-lists so no reducer ever
    materializes an unbounded posting list — the sub-lists stay separate
    index rows (the analogue of the reference's doc-partitioned db_0..4
    dirs, src/builder.cpp:98-109) and queries merge them, which is
    score-invariant because scoring uses only global df/avgdl/N
    (src/engine.cpp:30-32: all partitions share the global lexicon).
  * The sigma/skip pass (reference 2nd pass, builder.cpp:192-268) is
    map-only: per-term arrays are decoded, scored vectorized, and block
    maxima taken with np.maximum.reduceat every SKIP_BLOCK_SIZE postings.
  * doclen is carried through the explode instead of re-joined — postings
    arrive at the encoder self-contained.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField,
    StructType,
)

from searchenginepp_spark.config import (
    BM25_B, BM25_K1, SKIP_BLOCK_SIZE,
)
from searchenginepp_spark.functions.codecs import (
    delta_encode, unary_encode, unary_value_bit_offsets, varbyte_encode,
    varbyte_value_offsets,
)
from searchenginepp_spark.sources.corpus import (
    assign_docids, assign_docids_window, load_corpus, with_content_sha256,
    with_docno,
)

# How many postings a single index row (sub-list) may hold before the term
# is salted into multiple docid-hashed shards. 2^21 postings ≈ 4-8 MB blob.
SALT_TARGET_POSTINGS = 1 << 21


def tf_map_udf(stem: bool = True):
    """content → map<term,int> term frequencies, one Python pass per batch
    (reference builder.cpp:56-66 per-doc unordered_map)."""
    from searchenginepp_spark.functions.normalizer import term_frequencies
    from searchenginepp_spark.functions.porter2 import MemoStemmer

    @F.pandas_udf("map<string,int>")
    def _tf(content: pd.Series) -> pd.Series:
        st = MemoStemmer()
        return content.map(
            lambda t: dict(term_frequencies(t if t is not None else "", st, stem))
        )

    return _tf


def tokenize_corpus(corpus: DataFrame, stem: bool = True) -> DataFrame:
    """corpus(+docid) → per-doc tf map and doclen (doclen = Σtf, reference
    builder.cpp:69-73)."""
    df = corpus.withColumn("tf_map", tf_map_udf(stem)(F.col("content")))
    return df.withColumn(
        "doclen",
        F.aggregate(F.map_values("tf_map"), F.lit(0).cast("long"),
                    lambda acc, x: acc + x.cast("long")),
    )


def build_postings(tokenized: DataFrame) -> DataFrame:
    """Explode tf maps into the relational postings (term, docid, tf, doclen).
    Docs whose every token was filtered produce no postings (but stay in the
    docmap, matching the reference document index)."""
    return tokenized.select(
        F.col("docid"), F.col("doclen"),
        F.explode("tf_map").alias("term", "tf"),
    ).select("term", "docid", F.col("tf").cast("long").alias("tf"), "doclen")


def build_docmap(tokenized: DataFrame) -> DataFrame:
    """(docid, docno, repo, path, commit, lang, doclen, content_sha256) —
    reference document index (src/indexBuilder/IndexBuilder.cpp:74-98) plus
    the sha256 ingest invariant."""
    return tokenized.select(
        "docid", "docno", "repo", "path", "commit", "lang", "doclen",
        "content_sha256",
    )


def build_global_lexicon(postings: DataFrame) -> DataFrame:
    """term → collection-wide df. The shuffle IS the reference's k-way
    sorted merge of partition-local lexicons (builder.cpp:127-170)."""
    return postings.groupBy("term").agg(F.count("*").alias("df"))


def build_stats(docmap: DataFrame) -> DataFrame:
    """Single-row collection stats (reference metadata file,
    builder.cpp:177-181): n_docs, sum_doclen → avgdl = sum/n at read
    (Index.template.hpp:35-37)."""
    return docmap.agg(
        F.count("*").alias("n_docs"),
        F.sum("doclen").alias("sum_doclen"),
    )


_SHARD_SCHEMA = StructType([
    StructField("term", StringType()),
    StructField("shard", LongType()),
    StructField("df_shard", LongType()),
    StructField("first_docid", LongType()),
    StructField("last_docid", LongType()),
    StructField("docid_blob", BinaryType()),
    StructField("tf_blob", BinaryType()),
    StructField("doclen_blob", BinaryType()),
])

SKIP_FIELD = ArrayType(StructType([
    StructField("last_docid", LongType()),
    StructField("prev_docid", LongType()),   # last docid of previous block (0
                                             # for block 0) — delta-gap base so
                                             # a block decodes standalone
    StructField("n_postings", LongType()),   # postings in this block
    StructField("docid_off", LongType()),    # byte offset into docid_blob
    StructField("tf_bit_off", LongType()),   # bit offset into tf_blob
    StructField("doclen_off", LongType()),   # byte offset into doclen_blob
    StructField("bm25_ub", DoubleType()),
    StructField("tfidf_ub", DoubleType()),
]))


def _encode_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (term, shard) group → one compressed index row.
    Postings sorted by docid; docids delta-gap+varbyte, tfs unary, doclens
    varbyte (doclen carried per posting so BM25 inside the scorer UDF needs
    no docmap join)."""
    pdf = pdf.sort_values("docid")
    docids = pdf["docid"].to_numpy(dtype=np.uint64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    doclens = pdf["doclen"].to_numpy(dtype=np.uint64)
    return pd.DataFrame({
        "term": [pdf["term"].iloc[0]],
        "shard": [int(pdf["salt"].iloc[0])],
        "df_shard": [len(pdf)],
        "first_docid": [int(docids[0])],
        "last_docid": [int(docids[-1])],
        "docid_blob": [varbyte_encode(delta_encode(docids))],
        "tf_blob": [unary_encode(tfs)],
        "doclen_blob": [varbyte_encode(doclens)],
    })


def build_index_shards(postings: DataFrame,
                       salt_target: int = SALT_TARGET_POSTINGS,
                       num_partitions: int | None = None) -> DataFrame:
    """The one wide shuffle: postings → compressed per-(term,shard) rows.

    Heavy terms are detected with a df aggregation, broadcast, and salted by
    docid hash into ceil(df/salt_target) shards; everything else lands in
    shard 0. groupBy(term, salt) + applyInPandas encodes each sub-list.
    """
    spark = postings.sparkSession
    heavy = (
        postings.groupBy("term").agg(F.count("*").alias("df"))
        .filter(F.col("df") > salt_target)
        .withColumn("n_buckets",
                    F.ceil(F.col("df") / F.lit(salt_target)).cast("long"))
        .select("term", "n_buckets")
    )
    salted = (
        postings.join(F.broadcast(heavy), "term", "left")
        .withColumn(
            "salt",
            F.when(F.col("n_buckets").isNull(), F.lit(0).cast("long"))
            .otherwise(F.pmod(F.xxhash64("docid"), F.col("n_buckets"))),
        )
        .drop("n_buckets")
    )
    grouped = salted.groupBy("term", "salt")
    if num_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(num_partitions))
    return grouped.applyInPandas(_encode_shard, schema=_SHARD_SCHEMA)


def sigma_skip_pass(shards: DataFrame, global_lexicon: DataFrame,
                    n_docs: int, avgdl: float,
                    block_size: int = SKIP_BLOCK_SIZE) -> DataFrame:
    """Second pass (reference builder.cpp:192-268): per-shard σ upper bounds
    and skip pointers every SKIP_BLOCK_SIZE postings. Map-only — global df
    arrives by a join on term (broadcast when small; Catalyst/AQE decides),
    stats are plain Python constants captured by the UDF closure.

    Unlike the reference we do NOT quantize the bounds to 2 decimals
    (types.hpp:120-131) — its floor-truncation can make a stored bound lower
    than the true block max, which in rare margins prunes a true top-k doc.
    Exact doubles keep BMM rank-identical to exact DAAT.
    """
    from searchenginepp_spark.functions.codecs import decode_posting_list, varbyte_decode

    enriched = shards.join(global_lexicon.withColumnRenamed("df", "df_global"),
                           "term", "left")
    schema = StructType(
        [f for f in enriched.schema.fields]
        + [StructField("sigma_bm25", DoubleType()),
           StructField("sigma_tfidf", DoubleType()),
           StructField("skips", SKIP_FIELD)]
    )

    def score_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sig_b, sig_t, skips_col = [], [], []
            for row in pdf.itertuples(index=False):
                df_shard = int(row.df_shard)
                docids, tfs = decode_posting_list(row.docid_blob, row.tf_blob, df_shard)
                doclens = varbyte_decode(row.doclen_blob, count=df_shard)
                idf = float(np.log2(n_docs / float(row.df_global)))
                tfs_f = tfs.astype(np.float64)
                dl = doclens.astype(np.float64)
                bm25 = tfs_f / (BM25_K1 * ((1 - BM25_B) + BM25_B * dl / avgdl) + tfs_f) * idf
                tfidf = (1.0 + np.log2(tfs_f)) * idf
                starts = np.arange(0, df_shard, block_size)
                gaps = delta_encode(docids)
                d_offs = varbyte_value_offsets(gaps)
                t_offs = unary_value_bit_offsets(tfs)
                l_offs = varbyte_value_offsets(doclens)
                ends = np.minimum(starts + block_size, df_shard) - 1
                skips_col.append([
                    {
                        "last_docid": int(docids[e]),
                        "prev_docid": int(docids[s - 1]) if s > 0 else 0,
                        "n_postings": int(e - s + 1),
                        "docid_off": int(d_offs[s]),
                        "tf_bit_off": int(t_offs[s]),
                        "doclen_off": int(l_offs[s]),
                        "bm25_ub": float(np.max(bm25[s:e + 1])),
                        "tfidf_ub": float(np.max(tfidf[s:e + 1])),
                    }
                    for s, e in zip(starts, ends)
                ])
                sig_b.append(float(bm25.max()))
                sig_t.append(float(tfidf.max()))
            yield pdf.assign(sigma_bm25=sig_b, sigma_tfidf=sig_t, skips=skips_col)

    return enriched.mapInPandas(score_blocks, schema=schema)


class IndexPaths:
    """On-disk layout of one index build (all parquet; the production sink
    is an Iceberg catalog — same tables, sorted+bucketed by term)."""

    def __init__(self, root: str):
        self.root = root
        self.shards = f"{root}/index_shards"
        self.docmap = f"{root}/docmap"
        self.lexicon = f"{root}/global_lexicon"
        self.stats = f"{root}/stats"
        self.manifest = f"{root}/manifest"


def build_index(spark: SparkSession, corpus: DataFrame, out: str | IndexPaths,
                stem: bool = True, scalable_docids: bool = True,
                salt_target: int = SALT_TARGET_POSTINGS,
                term_partitions: int | None = None,
                block_size: int = SKIP_BLOCK_SIZE) -> IndexPaths:
    """Full build: corpus (repo,path,commit,lang,content) → persisted index.

    Writes: index_shards (term-sorted for row-group skipping), docmap,
    global_lexicon, stats.
    """
    paths = out if isinstance(out, IndexPaths) else IndexPaths(out)
    corpus = with_content_sha256(with_docno(corpus))
    corpus = (assign_docids(corpus) if scalable_docids
              else assign_docids_window(corpus))

    tokenized = tokenize_corpus(corpus, stem=stem)
    # tokenize once, feed both docmap and postings
    tokenized.persist()
    try:
        docmap = build_docmap(tokenized)
        docmap.write.mode("overwrite").parquet(paths.docmap)

        stats = build_stats(spark.read.parquet(paths.docmap))
        stats.write.mode("overwrite").parquet(paths.stats)
        srow = spark.read.parquet(paths.stats).collect()[0]
        n_docs, sum_doclen = srow["n_docs"], srow["sum_doclen"]
        avgdl = sum_doclen / n_docs if n_docs else 0.0

        postings = build_postings(tokenized)
        shards = build_index_shards(postings, salt_target=salt_target,
                                    num_partitions=term_partitions)

        lexicon = shards.groupBy("term").agg(F.sum("df_shard").alias("df"))
        # shards is consumed twice (lexicon + sigma pass); persist the
        # compressed form — it is ~10x smaller than the exploded postings
        shards.persist()
        try:
            lexicon.write.mode("overwrite").parquet(paths.lexicon)
            lexicon_r = spark.read.parquet(paths.lexicon)
            final = sigma_skip_pass(shards, lexicon_r, int(n_docs),
                                    float(avgdl), block_size=block_size)
            # term-sorted layout → parquet min/max stats give term pruning
            (final.repartitionByRange(
                term_partitions or spark.sparkContext.defaultParallelism,
                "term")
             .sortWithinPartitions("term", "shard")
             .write.mode("overwrite").parquet(paths.shards))
        finally:
            shards.unpersist()
    finally:
        tokenized.unpersist()
    return paths
