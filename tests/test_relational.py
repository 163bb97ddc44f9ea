"""Relational (TPC-H-ish) operators: result sanity at sf0.001 plus the
plan-shape invariants that matter at 100 TB — filters pushed into the
parquet scans, tiny dims broadcast, top-N as TakeOrderedAndProject."""

import pytest

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


@pytest.fixture(scope="module")
def tables(spark):
    return {n: _t(spark, n) for n in
            ("lineitem", "orders", "customer", "nation", "region", "supplier")}


def test_pricing_summary_shape_and_pushdown(spark, tables):
    from searchenginepp_spark.operators.relational import pricing_summary

    df = pricing_summary(tables["lineitem"])
    rows = df.collect()
    assert len(rows) == 6                      # 3 returnflags x 2 statuses
    assert all(r["count_order"] > 0 for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" \
        in plan


def test_top_unshipped_is_take_ordered(spark, tables):
    from searchenginepp_spark.operators.relational import top_unshipped_orders

    df = top_unshipped_orders(tables["customer"], tables["orders"],
                              tables["lineitem"], n=10)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan     # top-N, never a full sort


def test_regional_revenue_broadcasts_dims(spark, tables):
    from searchenginepp_spark.operators.relational import regional_revenue

    df = regional_revenue(tables["region"], tables["nation"],
                          tables["customer"], tables["orders"],
                          tables["lineitem"], tables["supplier"])
    rows = {r["n_name"]: r["revenue"] for r in df.collect()}
    assert 1 <= len(rows) <= 5                 # nations of one region
    assert all(v > 0 for v in rows.values())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan         # region->nation chain
