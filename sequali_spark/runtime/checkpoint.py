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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API (driver-local
    os.path.exists only sees the local filesystem)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def content_fingerprint(df: DataFrame, *cols: str) -> str:
    """Order-independent content fingerprint of the given columns:
    "rowcount:exact-sum-of-row-hashes".  SUM, not XOR (xor cancels
    duplicated rows, x^x=0); DECIMAL(38,0), not int64 (ANSI mode — the
    Spark 4 default — raises on int64 overflow, which a sum of 63-bit
    hashes hits after a handful of rows; the decimal domain is exact to
    ~10^19 rows).  Cost: one scan of the named columns + a 1-row
    collect — fingerprint the columns whose change must invalidate the
    checkpoint, nothing more."""
    r = df.agg(
        F.count("*").alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return f"{r['n']}:{r['h'] or 0}"


def file_fingerprint(df: DataFrame, *cols: str) -> str:
    """Input fingerprint WITHOUT a data scan: blake2b over the sorted
    (path, length, mtime) listing of the frame's backing files, plus
    the column names whose change must invalidate.

    Sound for parquet/ORC inputs because their part-files are immutable
    — any legitimate rewrite (Spark overwrite, compaction, upsert via a
    table format) produces different file names or at minimum different
    (length, mtime); the same trust model as the sketch-pin fingerprint
    (operators/dedup._batched_file_stats, hardened r6/r7).  False
    invalidation (byte-identical content rewritten in place) costs a
    recompute, never a wrong reuse.  Falls back to content_fingerprint
    when the frame is not file-backed (createDataFrame, cached views) —
    there is no listing to trust, so the scan is the honest price.

    ORDERING TRAP: call this BEFORE df.persist().  Registering a cache
    substitutes an InMemoryRelation into every plan that matches the
    cached one, after which inputFiles() returns [] and this function
    silently takes the content-scan fallback (correct, but it re-adds
    the serial scan this exists to remove).

    Motivation (r8 curation-ladder breakdown): the content fingerprint
    was a full id+text scan that ran SERIALLY before any parallel
    stage — 5.8-7.3 s at 500k rows regardless of core count, pure
    Amdahl tail in the scaling ladder."""
    import hashlib

    files = sorted(df.inputFiles())
    if not files:
        return content_fingerprint(df, *cols)
    from sequali_spark.operators.dedup import _batched_file_stats

    try:
        stats = _batched_file_stats(df.sparkSession, files)
    except Exception:
        # a part-file deleted/replaced between inputFiles() and the
        # stat (concurrent compaction, retention cleaner) must not
        # kill the job before it does any work — degrade to the scan,
        # the same posture as the sketch-pin fingerprint
        # (operators/dedup._cache_fingerprint)
        return content_fingerprint(df, *cols)
    h = hashlib.blake2b(digest_size=16)
    for f, length, mtime in stats:
        h.update(f"{f}|{length}|{mtime};".encode())
    h.update("|".join(cols).encode())
    return f"files:{len(files)}:{h.hexdigest()}"


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
    instead of silently reusing stale results.  Row comparison is
    order-insensitive (parquet read-back order follows file
    enumeration, not write order)."""
    if not (
        fs_exists(spark, data_path.rstrip("/") + "/_SUCCESS")
        and fs_exists(spark, manifest_path.rstrip("/") + "/_SUCCESS")
    ):
        return False
    stored = sorted(
        map(tuple, spark.read.schema(manifest_schema).parquet(manifest_path).collect())
    )
    expected = sorted(
        map(tuple, spark.createDataFrame(manifest_rows, schema=manifest_schema).collect())
    )
    return stored == expected


def invalidate_stage_manifest(spark: SparkSession, manifest_path: str) -> None:
    """Delete the manifest BEFORE overwriting the stage data.  Without
    this, a crash after the data overwrite but before the new manifest
    write leaves the PREVIOUS manifest beside the NEW data — and a
    later run with the previous parameters would match the stale
    manifest and silently reuse data computed under different
    parameters.  Deleting first makes every crash window fail toward
    recompute."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(manifest_path)
    fs = p.getFileSystem(conf)
    if fs.exists(p):
        fs.delete(p, True)


def write_stage_manifest(
    spark: SparkSession,
    manifest_path: str,
    manifest_rows: list[tuple],
    manifest_schema: str,
) -> None:
    """Commit the manifest AFTER the stage data (and after
    invalidate_stage_manifest before it): data without a matching
    manifest is treated as not-reusable, so both halves of the crash
    window recompute."""
    spark.createDataFrame(manifest_rows, schema=manifest_schema).write.mode(
        "overwrite"
    ).parquet(manifest_path)
