#!/usr/bin/env python
"""spark-submit entry point for the index build (north rule: "runs via
spark-submit --py-files on multi-executor clusters").

Package the library and submit:

    cd /root/repo && zip -r /tmp/sepp.zip searchenginepp_spark
    spark-submit --py-files /tmp/sepp.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.execution.arrow.maxRecordsPerBatch=100000 \\
        scripts/submit_build.py \\
        --input  <corpus parquet/iceberg path> \\
        --output <index root> \\
        [--resumable --buckets 64] [--no-stem] [--term-partitions N]

The input table must have columns (repo, path, commit, lang, content) —
BASELINE.json input_hint — or the driver's synthetic documents shape
(doc_id, text, ...), which load_corpus adapts.

Local smoke (no cluster):

    python scripts/submit_build.py --input /root/testdata/sf0.001/documents.parquet \\
        --output /tmp/sepp_index --master 'local[4]'
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local smoke runs from the repo; under spark-submit the --py-files zip
# provides the package instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--master", default=None,
                    help="only for local smoke runs; omit under spark-submit")
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--term-partitions", type=int, default=None)
    ap.add_argument("--resumable", action="store_true",
                    help="checkpointed per-bucket build (plans/checkpoint.py)")
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("sepp-index-build")
    if args.master:
        builder = builder.master(args.master).config("spark.ui.enabled", "false")
    spark = builder.getOrCreate()

    from searchenginepp_spark.sources.corpus import load_corpus

    corpus = load_corpus(spark, args.input)
    stem = not args.no_stem
    if args.resumable:
        from searchenginepp_spark.plans.checkpoint import build_index_resumable

        paths = build_index_resumable(spark, corpus, args.output, stem=stem,
                                      n_buckets=args.buckets,
                                      term_partitions=args.term_partitions)
    else:
        from searchenginepp_spark.operators.index_build import build_index

        paths = build_index(spark, corpus, args.output, stem=stem,
                            term_partitions=args.term_partitions)

    stats = spark.read.parquet(paths.stats).collect()[0]
    print(json.dumps({"index_root": paths.root,
                      "n_docs": stats["n_docs"],
                      "sum_doclen": stats["sum_doclen"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
