#!/usr/bin/env python
"""Materialize the (token -> Porter2 stem) vocabulary map as a parquet
fixture so the DuckDB oracle can gate the STEMMED flagship query.

Stemming itself is not SQL-expressible, but the stem FUNCTION restricted to
a known vocabulary is just a lookup table: this script tokenizes every
document of the driver's testdata scale factors (plus the fixed QUERY_SET)
with the reference pipeline minus stemming, then records each surviving
token's ctypes-validated Porter2 stem (tests/test_porter2.py pins 18k-word
parity with the Snowball C library).  The oracle SQL joins this table after
its own tokenize CTE — semantics identical to the engine's stem-after-filter
order (/root/reference/src/normalizer/WordNormalizer.cpp:62-73).

Regenerate after changing the tokenizer, the stemmer, QUERY_SET, or the
testdata:  python scripts/gen_stem_map.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "searchenginepp_spark", "data", "stem_map.parquet")


def main() -> None:
    from searchenginepp_spark.config import MAX_TOKEN_LEN
    from searchenginepp_spark.functions.normalizer import (
        _WS_SPLIT_RE, remove_punctuation,
    )
    from searchenginepp_spark.functions.porter2 import MemoStemmer
    from searchenginepp_spark.functions.stop_words import stop_words
    from searchenginepp_spark.oracle_sql import QUERY_SET

    sw = stop_words()
    texts: list[str] = [t for _, t in QUERY_SET]
    for sf in SF_DIRS:
        path = f"{sf}/documents.parquet"
        if os.path.exists(path):
            texts.extend(pq.read_table(path, columns=["text"])
                         .column("text").to_pylist())

    vocab: set[str] = set()
    for text in texts:
        for tok in _WS_SPLIT_RE.split(remove_punctuation(text or "")):
            tok = tok.lower()
            if tok and len(tok) <= MAX_TOKEN_LEN and tok not in sw:
                vocab.add(tok)

    st = MemoStemmer()
    tokens = sorted(vocab)
    tbl = pa.table({"token": pa.array(tokens, pa.string()),
                    "stem": pa.array([st(t) for t in tokens], pa.string())})
    pq.write_table(tbl, OUT, compression="zstd")
    n_changed = sum(1 for t in tokens if st(t) != t)
    print(f"wrote {OUT}: {len(tokens)} tokens, {n_changed} with stem != token")


if __name__ == "__main__":
    main()
