"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the labels table is joined back to the pages table constantly
(scrub materialization, re-labeling, incremental runs).  Bucketing both
sides by the join key at write time makes every such join exchange-free:
Spark reads matching buckets pairwise (the Iceberg equivalent is the
``bucket(N, url)`` hidden-partition transform declared in
sources/tables.py).  This module is the parquet-warehouse demonstration
of that layout + a plan assertion helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist as a bucketed+sorted table (saveAsTable is required —
    bucket metadata lives in the catalog).  ``path`` makes the table
    EXTERNAL at that location instead of warehouse-managed (tests and
    ad-hoc runs should not write into the session warehouse dir)."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two tables bucketed on the same key: with
    spark.sql.sources.bucketing.enabled (default true) the plan is a
    SortMergeJoin with ZERO Exchange nodes."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
