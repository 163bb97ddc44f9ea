"""Interactive / batch query CLI over a persisted index — the analogue of
the reference engine binary's stdin modes (/root/reference/src/engine.cpp:74-79:
interactive REPL, or batch lines of "qid\\tquery" producing TREC output).

Serves through LocalSearcher (no Spark session: ms-scale latency, same
MaxScore kernel and rank order as the cluster paths).

    python -m searchenginepp_spark.cli INDEX_DIR                # REPL
    python -m searchenginepp_spark.cli INDEX_DIR --batch < q.tsv  # TREC run

Batch input: one "qid<TAB>query text" per line (engine.cpp:78); output:
"qid Q0 docno rank score run" (engine.cpp:132-135).
"""

from __future__ import annotations

import argparse
import sys

from searchenginepp_spark.operators.local_engine import LocalSearcher


def _print_trec(results, run_name: str, out=sys.stdout) -> None:
    for qid, _docid, docno, rank, score in results:
        print(f"{qid} Q0 {docno} {rank} {score:.6f} {run_name}", file=out)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="Query a searchenginepp_spark index from the terminal.")
    ap.add_argument("index", help="index directory (build_index output)")
    ap.add_argument("--batch", action="store_true",
                    help="read 'qid\\tquery' lines from stdin, emit TREC run")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--scorer", choices=["bm25", "tfidf"], default="bm25")
    ap.add_argument("--conjunctive", action="store_true")
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("--run-name", default="sepp-spark")
    args = ap.parse_args(argv)

    searcher = LocalSearcher(args.index, stem=not args.no_stem)

    if args.batch:
        queries = []
        for line in sys.stdin:
            line = line.rstrip("\n")
            if not line:
                continue
            qid, _, text = line.partition("\t")
            queries.append((int(qid), text))
        _print_trec(searcher.search(queries, k=args.k, scorer=args.scorer,
                                    conjunctive=args.conjunctive),
                    args.run_name)
        return 0

    # interactive REPL (engine.cpp:74-76)
    qid = 0
    while True:
        try:
            text = input("query> ")
        except EOFError:
            return 0
        if not text.strip():
            continue
        qid += 1
        res = searcher.search([(qid, text)], k=args.k, scorer=args.scorer,
                              conjunctive=args.conjunctive)
        if not res:
            print("(no results)")
        for _q, docid, docno, rank, score in res:
            print(f"{rank:3d}  {score:10.6f}  {docno}  (docid {docid})")


if __name__ == "__main__":
    sys.exit(main())
