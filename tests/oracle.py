"""Brute-force single-process BM25/TFIDF oracle — exact DAAT semantics
(the reference's disjunctive/conjunctive query processor,
/root/reference/src/index/Index.template.hpp:98-165), used to pin the Spark
engine's results at small scale."""

from __future__ import annotations

import math
from collections import Counter

from searchenginepp_spark.config import BM25_B, BM25_K1
from searchenginepp_spark.functions.normalizer import term_frequencies, tokenize
from searchenginepp_spark.functions.porter2 import MemoStemmer


class BruteForceIndex:
    def __init__(self, docs: list[tuple[int, str, str]], stem: bool = True):
        """docs: (docid, docno, content)"""
        self.stem = stem
        st = MemoStemmer()
        self.docno = {}
        self.doclen = {}
        self.postings: dict[str, dict[int, int]] = {}
        for docid, docno, content in docs:
            tf = term_frequencies(content, st, stem)
            self.docno[docid] = docno
            self.doclen[docid] = sum(tf.values())
            for term, f in tf.items():
                self.postings.setdefault(term, {})[docid] = f
        self.n_docs = len(docs)
        self.avgdl = (sum(self.doclen.values()) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        return math.log2(self.n_docs / len(self.postings[term]))

    def score(self, term: str, docid: int, scorer: str) -> float:
        tf = self.postings[term][docid]
        idf = self.idf(term)
        if scorer == "bm25":
            dl = self.doclen[docid]
            return tf / (BM25_K1 * ((1 - BM25_B) + BM25_B * dl / self.avgdl) + tf) * idf
        return (1 + math.log2(tf)) * idf

    def search(self, text: str, k: int = 10, scorer: str = "bm25",
               conjunctive: bool = False) -> list[tuple[int, str, int, float]]:
        """→ [(docid, docno, rank, score)] with (score desc, docid asc)."""
        qterms = sorted(set(tokenize(text, MemoStemmer(), self.stem)))
        present = [t for t in qterms if t in self.postings]
        if conjunctive and len(present) < len(qterms):
            return []
        if not present:
            return []
        acc: Counter = Counter()
        nmatch: Counter = Counter()
        for t in present:
            for docid in self.postings[t]:
                acc[docid] += self.score(t, docid, scorer)
                nmatch[docid] += 1
        items = [
            (d, s) for d, s in acc.items()
            if not conjunctive or nmatch[d] == len(present)
        ]
        items.sort(key=lambda ds: (-round(ds[1], 6), ds[0]))
        return [
            (d, self.docno[d], i + 1, round(s, 6))
            for i, (d, s) in enumerate(items[:k])
        ]
