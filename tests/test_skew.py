"""Skew handling: the Zipf mega-host must not concentrate a partition.

The north rule mandates salted repartitioning for skewed hosts; this
test measures actual partition balance with and without the salt."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sequali_spark.pipeline import with_partitioning
from tests.test_pipeline import pages_df


def _partition_sizes(df):
    rows = df.select(F.spark_partition_id().alias("pid")).groupBy("pid").count().collect()
    return np.array([r["count"] for r in rows], dtype=np.float64)


def test_fixture_is_host_skewed(pages_small):
    hosts = pages_small["url"].str.extract(r"https://([^/]+)/")[0]
    top = hosts.value_counts()
    assert top.iloc[0] / len(hosts) > 0.3  # host000 is a true mega-host


def test_salting_balances_partitions(spark, pages_small):
    pages = pages_df(spark, pages_small, partitions=8)

    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    by_host = pages.repartition(16, host)
    salted = with_partitioning(pages, 16)

    s_host = _partition_sizes(by_host)
    s_salted = _partition_sizes(salted)

    # host-only partitioning leaves a partition holding the mega-host
    assert s_host.max() / s_host.mean() > 2.0
    # salted (day, hash(host,url)%64) partitioning stays balanced
    assert s_salted.max() / s_salted.mean() < 1.6
    assert s_salted.sum() == len(pages_small)


def test_salted_distinct_equals_direct(spark, pages_small):
    """The two-stage salted COUNT(DISTINCT) must equal the direct one."""
    from sequali_spark.operators import aggregates as agg
    from sequali_spark.pipeline import quality_pipeline

    m = quality_pipeline(spark, pages_df(spark, pages_small), repartition=False)
    m = m.select("url").persist()
    m.count()
    try:
        host = F.regexp_extract("url", r"https://([^/]+)/", 1)
        direct = {
            r["host"]: r["d"]
            for r in m.groupBy(host.alias("host"))
            .agg(F.countDistinct("url").alias("d"))
            .collect()
        }
        salted = {
            r["host"]: r["distinct_urls"]
            for r in agg.per_host_distinct_urls_salted(m).collect()
        }
        assert salted == direct
    finally:
        m.unpersist()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Tables bucketed on the join key join with zero shuffles."""
    from sequali_spark.plans import checks
    from sequali_spark.sources import bucketing

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # the fixture is tiny, so Catalyst would broadcast; at 100TB both
    # sides are fact-sized — force the sort-merge path bucketing serves
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketing.write_bucketed(
            docs.select("doc_id", "text"), "b_docs", "doc_id",
            path=str(tmp_path / "b_docs"),
        )
        bucketing.write_bucketed(
            docs.select("doc_id", "lang", "source"), "b_meta", "doc_id",
            path=str(tmp_path / "b_meta"),
        )
        joined = bucketing.bucketed_join(spark, "b_docs", "b_meta", "doc_id")
        assert joined.count() == docs.count()
        plan = checks.physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan, plan  # the scans actually used buckets
        assert checks.shuffle_count(joined) == 0, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_meta")
