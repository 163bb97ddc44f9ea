"""searchenginepp_spark — a PySpark-native inverted-index builder + BM25
query engine with the query semantics of scarburato/searchenginepp
(reference at /root/reference, C++20), re-architected Spark-first.

Layout:
    functions/   pure computational kernels (normalizer, stemmer, codecs)
    sources/     corpus loading / synthesis (Iceberg-shaped source-code table)
    operators/   index build, query (DAAT + block-max), dedup, similarity
    plans/       checkpoint / lineage manifests for resumable builds
    streaming/   Structured Streaming ingest path
"""

__version__ = "0.1.0"
