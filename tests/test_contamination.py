"""contamination_check — n-gram leakage of benchmark text into training
docs.  Plants an exact leak, a partial leak below threshold, and clean
docs; also pins the scale-critical plan shape (benchmark side broadcast,
no shuffle of the corpus-sized shingle frame for the join)."""

from pyspark.sql import functions as F

from searchenginepp_spark.operators.text_analysis import contamination_check

BENCH = "the quick brown fox jumps over the lazy dog tonight"


def _frames(spark):
    train = spark.createDataFrame(
        [
            (1, "intro text then " + BENCH + " and a closing line"),   # leak
            (2, "the quick brown cat sat still"),   # shares < 3 shingles
            (3, "completely unrelated content about spark partitions"),
            (4, BENCH),                                                # leak
        ],
        "docid long, content string")
    bench = spark.createDataFrame([(100, BENCH)], "docid long, content string")
    return train, bench


def test_contamination_flags_leaks_only(spark):
    train, bench = _frames(spark)
    got = {r["docid"]: (r["n_shared_shingles"], r["n_benchmark_docs"])
           for r in contamination_check(train, bench, n=3,
                                        min_shared=3).collect()}
    n_bench_shingles = len(BENCH.split()) - 2
    assert set(got) == {1, 4}
    assert got[4] == (n_bench_shingles, 1)      # verbatim copy shares all
    assert got[1][0] >= n_bench_shingles        # superset doc too
    assert got[1][1] == 1


def test_min_shared_threshold(spark):
    train, bench = _frames(spark)
    got = {r["docid"] for r in
           contamination_check(train, bench, n=3, min_shared=1).collect()}
    assert 2 in got                             # 'the quick brown' matches


def test_benchmark_side_is_broadcast(spark):
    train, bench = _frames(spark)
    plan = contamination_check(train, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
