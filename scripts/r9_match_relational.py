"""Collect-compare MATCH check for the r9 long-split rewrites of
rel_region_revenue / rel_part_type_share / rel_value_band_join: the old
decimal-sum formulation (retained reference helpers) vs the new exact
long-split implementations, row-for-row at the given SF dir.

Usage: python scripts/r9_match_relational.py [sf_dir]
"""
from __future__ import annotations

import sys

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from sequali_spark.session import get_spark
from sequali_spark.operators import relational
from sequali_spark.operators.relational import _dec, _cents, _cents12, load


def old_region_revenue(spark, sf_dir, region="ASIA"):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(reg.filter(F.col("r_name") == region)), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1994-01-01"))
            & (F.col("o_orderdate") < F.lit("1995-01-01"))
        )
        .groupBy("n_name")
        .agg(_cents12(revenue).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), "n_name")
    )


def old_part_type_share(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))
    )
    per_type = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01"))
            & (F.col("l_shipdate") < F.lit("1995-10-01"))
        )
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count("*").alias("line_items"),
            _cents12(revenue).alias("revenue_cents"),
        )
    )
    i64 = 9223372036854775807
    total_dec = F.sum(F.col("revenue_cents").cast("decimal(19,0)")).over(W.partitionBy())
    share = F.when(
        F.col("revenue_cents") <= F.lit(i64 // 10000),
        F.expr("(10000 * revenue_cents) DIV _total"),
    )
    return (
        per_type.withColumn("_total_dec", total_dec)
        .withColumn(
            "_total",
            F.when(F.col("_total_dec") <= F.lit(i64), F.col("_total_dec").cast("long")),
        )
        .select("p_type", "line_items", "revenue_cents", share.alias("revenue_share_bps"))
        .orderBy("p_type")
    )


def old_value_band_join(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 100.0), ("high", 100.0, 1e9)],
        schema="band string, lo double, hi double",
    )
    joined = e.join(
        F.broadcast(bands), (e.value >= bands.lo) & (e.value < bands.hi), "inner"
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count("*").alias("events"),
            _cents(F.sum(F.col("value").cast("decimal(18,6)"))).alias("value_sum_cents"),
        )
        .orderBy("band")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("r9_match_relational")
    pairs = [
        ("rel_region_revenue", old_region_revenue(spark, sf_dir),
         relational.region_revenue(spark, sf_dir)),
        ("rel_part_type_share", old_part_type_share(spark, sf_dir),
         relational.part_type_revenue_share(spark, sf_dir)),
        ("rel_value_band_join", old_value_band_join(spark, sf_dir),
         relational.value_band_join(spark, sf_dir)),
    ]
    rc = 0
    for name, old_df, new_df in pairs:
        old_rows = [tuple(r) for r in old_df.collect()]
        new_rows = [tuple(r) for r in new_df.collect()]
        old_schema = [(f.name, f.dataType.simpleString()) for f in old_df.schema.fields]
        new_schema = [(f.name, f.dataType.simpleString()) for f in new_df.schema.fields]
        ok = old_rows == new_rows and old_schema == new_schema
        print(f"{name}: rows={len(old_rows)}/{len(new_rows)} "
              f"schema_match={old_schema == new_schema} "
              f"{'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            rc = 1
            for i, (a, b) in enumerate(zip(old_rows, new_rows)):
                if a != b:
                    print(f"  first diff row {i}: old={a} new={b}")
                    break
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
