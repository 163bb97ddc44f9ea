"""Text-analysis operator semantics — edge cases the oracle data can't hit
(empty docs, punctuation-only docs) plus the fingerprint overlap property."""

import pytest
from pyspark.sql import functions as F

from searchenginepp_spark.operators.text_analysis import (
    doc_fingerprint, language_id, quality_scores, token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox and the lazy dog"),
        (2, "der die und das ist hier"),
        (3, "!!! ,,, ..."),                      # punctuation only
        (4, ""),                                  # empty
        (5, "x1 y2 z3 foo_bar(baz); qux->quux"),  # code-ish
    ]
    return spark.createDataFrame(rows, "docid long, content string")


def test_token_counts(spark, docs):
    r = {x["docid"]: x for x in token_counts(docs).collect()}
    assert r[1]["n_ws_tokens"] == 8
    assert r[4]["n_ws_tokens"] == 0 and r[4]["n_chars"] == 0
    assert r[3]["n_ws_tokens"] == 3              # punctuation clumps
    assert r[3]["n_bpe_tokens"] == 9             # each mark its own token
    # code-ish: alpha runs, digit runs, and marks all counted
    assert r[5]["n_bpe_tokens"] > r[5]["n_ws_tokens"]


def test_quality_scores(spark, docs):
    r = {x["docid"]: x for x in quality_scores(docs).collect()}
    assert r[1]["stopword_ratio"] == pytest.approx(3 / 8)  # the, and, the
    assert r[1]["alpha_ratio"] > 0.7
    assert r[3]["alpha_ratio"] == 0.0
    assert r[4]["n_ws_tokens"] == 0 and r[4]["quality"] is not None
    assert 0.0 <= r[5]["quality"] <= 1.0
    assert len(r) == 5                            # empty docs kept


def test_language_id(spark, docs):
    r = {x["docid"]: x["lang_pred"] for x in language_id(docs).collect()}
    assert r[1] == "en"
    assert r[2] == "de"
    assert r[3] == "und" and r[4] == "und"


def test_fingerprint_overlap_property(spark):
    """Mod-sampling is position-independent: a doc that contains another
    doc's text verbatim selects a superset of its k-gram hashes, regardless
    of where the shared text sits."""
    shared = "function compute_the_answer(x) { return x * 42; }"
    rows = [
        (1, shared),
        (2, "PREFIX PADDING >>> " + shared + " <<< SUFFIX PADDING"),
        (3, "totally unrelated content with no overlap whatsoever here"),
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    fp = {r["docid"]: r for r in doc_fingerprint(docs).collect()}
    assert fp[1]["n_grams"] == len(shared) - 7
    assert fp[1]["n_selected"] <= fp[2]["n_selected"]
    assert fp[1]["fingerprint"] != fp[3]["fingerprint"]

    # identical content ⇒ identical fingerprint even with different docids
    docs2 = spark.createDataFrame([(9, shared)], "docid long, content string")
    fp9 = doc_fingerprint(docs2).collect()[0]
    assert fp9["fingerprint"] == fp[1]["fingerprint"]


def test_fingerprint_empty_doc(spark):
    docs = spark.createDataFrame([(1, ""), (2, "short")],
                                 "docid long, content string")
    r = {x["docid"]: x for x in doc_fingerprint(docs).collect()}
    assert r[1]["n_grams"] == 0 and r[1]["n_selected"] == 0
    assert r[2]["n_grams"] == 0                  # shorter than k
    # md5 of empty selection is the md5 of the empty string, both engines
    assert r[1]["fingerprint"] == "d41d8cd98f00b204e9800998ecf8427e"


def test_fingerprint_kernel_matches_sql_form(spark):
    """The mapInPandas rolling kernel must be output-identical to the
    declarative explode form (same md5-prefix mod-sampling) — including
    empty docs, docs shorter than k, non-ASCII and repeated content."""
    from searchenginepp_spark.operators.text_analysis import doc_fingerprint_sql

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 5),
        (2, ""),
        (3, "short"),                              # < k chars
        (4, "exactly8"),                           # == k chars
        (5, "naïve café — déjà vu ¶ done here"),   # multi-byte chars
        (6, "the quick brown fox jumps over the lazy dog " * 5),  # dup of 1
        (7, "AAAAAAAAAAAAAAAAAAAAAAAA"),           # degenerate repeats
    ]
    docs = spark.createDataFrame(rows, "docid long, content string")
    kern = sorted(map(tuple, doc_fingerprint(docs).collect()))
    sql = sorted(map(tuple, doc_fingerprint_sql(docs).collect()))
    assert kern == sql
    by_id = dict((r[0], r) for r in kern)
    assert by_id[1] == (6, *by_id[6][1:]) or by_id[1][1:] == by_id[6][1:]
