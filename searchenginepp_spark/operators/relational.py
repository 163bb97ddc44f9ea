"""Classic relational analytics over the TPC-H-shaped driver tables —
grouped aggregation, selective join + top-N, and a 6-way star join.

These exercise the engine surface a search-engine user also needs for the
surrounding analytics (the reference repo's report tables are produced by
exactly this kind of grouped-agg query over run logs).  All three are pure
declarative DataFrame plans:

  * filters sit directly on the scans (parquet predicate pushdown; verify
    with .explain → PushedFilters);
  * only the GENUINELY tiny dimensions (region: 5 rows, nation: 25) carry
    an explicit broadcast hint — customer/orders/supplier scale with the
    data, so their joins are left to Catalyst/AQE, which broadcasts them
    exactly when the filtered side is small enough and shuffle-joins on
    the key otherwise;
  * aggregates are map-side combinable (sum/count/avg), so the shuffle
    carries one partial row per (task, group), not per input row.

At 100 TB the lineitem scan dominates; nothing here materializes more than
(n_groups) rows after the agg (Q3's top-N is a TakeOrderedAndProject —
per-partition heap + driver merge of N rows, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed cutoff dates shared with the oracle SQL (data spans 1995..2001).
Q1_SHIP_CUTOFF = "1998-09-02"
Q3_DATE = "1998-03-15"


def pricing_summary(lineitem: DataFrame,
                    ship_cutoff: str = Q1_SHIP_CUTOFF) -> DataFrame:
    """TPC-H Q1-style pricing summary: one scan, one map-side-combined agg.
    (qty/price sums, discounted + taxed charges, averages, row counts per
    returnflag × linestatus.)"""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(F.sum(disc_price), 6).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def top_unshipped_orders(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, segment: str = "BUILDING",
                         date: str = Q3_DATE, n: int = 10) -> DataFrame:
    """TPC-H Q3-style: revenue of orders placed before `date` with items
    still unshipped at `date`, for one market segment; top-N by revenue.
    customer/orders scale with the data — no broadcast hint; AQE picks
    broadcast when the filtered sides fit, key-shuffle otherwise."""
    d = F.lit(date).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < d).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    items = lineitem.filter(F.col("l_shipdate") > d).select(
        "l_orderkey", "l_extendedprice", "l_discount")
    joined = (
        items.join(ords.join(cust, ords.o_custkey == cust.c_custkey),
                   items.l_orderkey == F.col("o_orderkey"))
    )
    agg = joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6)
        .alias("revenue"))
    return (
        agg.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(n)
        .select("o_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "o_orderpriority")
    )


def regional_revenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                     orders: DataFrame, lineitem: DataFrame,
                     supplier: DataFrame, region_name: str = "ASIA",
                     year: int = 1996) -> DataFrame:
    """TPC-H Q5-style 6-way star join: revenue by nation where customer and
    supplier share the nation, for one region and one order year.  The
    region→nation chain (≤25 rows) is broadcast into the customer and
    supplier scans; the large joins (lineitem⋈orders on orderkey,
    ⋈customer on custkey, ⋈supplier on suppkey) are key-shuffles AQE may
    individually downgrade to broadcasts at small SF."""
    nat = (nation.join(F.broadcast(
        region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"))
        .select("n_nationkey", "n_name"))
    y0 = F.lit(f"{year}-01-01").cast("timestamp")
    y1 = F.lit(f"{year + 1}-01-01").cast("timestamp")
    ords = orders.filter((F.col("o_orderdate") >= y0)
                         & (F.col("o_orderdate") < y1)).select(
        "o_orderkey", "o_custkey")
    cust = customer.join(F.broadcast(nat),
                         customer.c_nationkey == F.col("n_nationkey")).select(
        "c_custkey", F.col("n_nationkey").alias("c_nkey"),
        F.col("n_name").alias("c_nname"))
    supp = supplier.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("s_nkey"))),
        supplier.s_nationkey == F.col("s_nkey")).select("s_suppkey", "s_nkey")
    joined = (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp,
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nkey") == F.col("s_nkey")))
    )
    return (
        joined.groupBy(F.col("c_nname").alias("n_name"))
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 6).alias("revenue"))
    )
