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
