"""Stage-checkpoint helper: an expensive stage materialized to parquet
plus a one-row MANIFEST of the producing invocation; a later run reuses
the stage only when the manifest matches bit-for-bit.

This is the resume granularity for corpus-GLOBAL stages (dedup
signatures, curation decisions) that cannot be split into per-partition
lineage units without changing semantics — the complement of
runtime/lineage.py's day-unit resume for per-doc stages.  Existence
checks go through the Hadoop FileSystem API so the pattern works on
hdfs:// and s3a:// outputs, not just the local FS.  Used by
jobs/run_curation.py and jobs/run_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API (driver-local
    os.path.exists only sees the local filesystem)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def stage_is_reusable(
    spark: SparkSession,
    data_path: str,
    manifest_path: str,
    manifest_rows: list[tuple],
    manifest_schema: str,
) -> bool:
    """True iff the stage data AND its manifest both committed
    (_SUCCESS) and the stored manifest equals this invocation's —
    a changed parameter or input fingerprint forces a recompute
    instead of silently reusing stale results."""
    return (
        fs_exists(spark, data_path.rstrip("/") + "/_SUCCESS")
        and fs_exists(spark, manifest_path.rstrip("/") + "/_SUCCESS")
        and spark.read.schema(manifest_schema).parquet(manifest_path).collect()
        == spark.createDataFrame(manifest_rows, schema=manifest_schema).collect()
    )


def write_stage_manifest(
    spark: SparkSession,
    manifest_path: str,
    manifest_rows: list[tuple],
    manifest_schema: str,
) -> None:
    """Commit the manifest AFTER the stage data: a crash between the
    two leaves a data dir without a matching manifest, which
    stage_is_reusable treats as not-reusable (safe recompute)."""
    spark.createDataFrame(manifest_rows, schema=manifest_schema).write.mode(
        "overwrite"
    ).parquet(manifest_path)
