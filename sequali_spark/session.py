"""SparkSession factory tuned for this engine.

Local-mode defaults match the sandbox (one JVM, N threads); on a real
cluster the same settings apply except memory sizing.  AQE is on so
skewed hosts (the pages table's Zipf mega-host) get runtime skew-join
and partition coalescing — the optimizer-level complement to the
explicit salting in operators (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32

# Scan-split size for Arrow-bound stages; see the inline rationale at the
# config site in get_spark.  Overridable per-deployment.
DEFAULT_MAX_PARTITION_BYTES = 16 * 1024 * 1024


def max_partition_bytes() -> str:
    """Resolve the scan-split size: SPARK_GRAFT_MAX_PARTITION_BYTES if
    set, else the Arrow-stage-sized 16 MB default."""
    return os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", str(DEFAULT_MAX_PARTITION_BYTES)
    )


def get_spark(
    app_name: str = "sequali_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst stays at its DEFAULT (true).  r5 tried false
        # (Spark docs' small-shuffle advice): interleaved A/B at sf0.1
        # showed no wall-clock benefit (tiny-stage latency is
        # scheduler/python-handshake-bound, not partition-count-bound),
        # and at 2M rows the 64MB-advisory coalescing concentrated
        # window sorts into few large partitions whose concurrent sorts
        # exhausted the shared local-mode memory pool
        # (UNABLE_TO_ACQUIRE_MEMORY in the curation job).  Keep
        # parallelism-first sizing; on a real cluster executors own
        # their pools and the advisory knob can be revisited per-job.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Scan-split granularity for Python-heavy stages (r8, measured
        # at 2M docs / local[8]): the default 128 MB splits turned a
        # 900 MB corpus into 10 tasks of ~200k docs each — the bare
        # minhash mapInPandas stage took 341 s (per-doc throughput
        # DEGRADES inside long Arrow tasks: 8 concurrent Python workers
        # over ~230 MB text slices contend for memory bandwidth, and a
        # 10-task stage on 8 cores is one wave plus stragglers).  16 MB
        # splits -> 65 tasks -> 245 s, near-linear with the 500k
        # datapoint, AND the finer granularity load-balances both legs
        # of the scaling ladder (the 10-task shape scaled 2->8 at ~0.35
        # because the 8-core leg ran one ragged wave).  Smaller splits
        # cost only scheduler overhead (~ms/task); at cluster scale
        # this knob is per-job, but the engine's hot stages are
        # Arrow-bound, so the Python-friendly size is the right
        # default.  SPARK_GRAFT_MAX_PARTITION_BYTES overrides.
        .config("spark.sql.files.maxPartitionBytes", max_partition_bytes())
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Shuffle/IO codec (r8, two measured regimes): on the BIG text
        # shuffle (paragraph-dedup election, 5M docs/local[32]) zstd
        # cuts bytes 7.8 -> 5.1 GB (-35%) at wall parity (73.1 vs
        # 73.8 s) — the win a network-shuffle deployment wants.  But on
        # the sf0.1 headline's MANY-SMALL-SHUFFLE regime an ABAB A/B
        # read zstd 11.95/11.65 s vs lz4 10.49/10.55 s (~11% tax:
        # per-block codec CPU dominates when shuffles are KBs-MBs).
        # Default stays lz4; set SPARK_GRAFT_IO_CODEC=zstd on jobs
        # whose shuffles actually cross a network.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # ObjectHashAggregate (collect_list/collect_set aggs) falls back
        # to SORT-based aggregation once a task's hash map passes this
        # many distinct keys.  r9 first raised this GLOBALLY to 4M on an
        # isolated minhash-bucket ABAB (1.31/1.31 s at 128 vs
        # 1.14/1.05 s at 4M on the 800k-row agg) — and a late-round 2M
        # paragraph-ladder re-run caught the raise REGRESSING the
        # high-cardinality pid-array agg ~20% on the 8-cpu leg (43.5 s
        # at 128 vs 53.3 s at 4M, same window; 2M distinct doc_id
        # groups churn as in-memory array buffers in hash mode, while
        # the sort path streams them).  The knob is therefore
        # per-AGGREGATE, not global: the session default stays at
        # Spark's 128 (which both committed at-scale ladder records
        # ran under), and the minhash pairs path — few distinct
        # bucket keys per task — pins 4M at build time
        # (dedup.minhash_pairs_from_sigs).  The conf is perf-only
        # (never changes results), so build-time scoping is safe.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread_for_python(df, cap: int | None = None, bytes_per_task: int | None = None):
    """CPU-spread guard for Python (mapInPandas) stages: scan bytes !=
    compute cost, so a small-but-CPU-heavy input can arrive as a single
    scan split (sf0.1 documents is ONE 584 KB split) and starve the
    Arrow stage down to one core.  Repartition to min(cap, session
    parallelism) ONLY when the scan under-decomposes — at production
    scale row-group splits exceed cores and this is a no-op, so the
    payload column never shuffles on the scale path.  ``cap`` bounds the
    spread for stages whose fresh Python workers pay a model-load cost
    (each new worker imports + initializes the model; on a small input
    that setup dominates).  (Same discipline as the 4 MB
    maxPartitionBytes knob for the label pipeline: partition by compute,
    not bytes, when the stage is UDF-bound.)"""
    if df.isStreaming:  # .rdd is illegal on a streaming frame; micro-
        return df       # batch sizing is the trigger's job, not ours
    target = df.sparkSession.sparkContext.defaultParallelism
    if bytes_per_task is not None:
        # size-aware spread width (r9): a FIXED cap is wrong at both
        # ends — cap=8 left 24 cores idle on the 50k-doc sf1.0 corpus
        # (measured 2.57 s vs 1.49 s uncapped) while uncapped split the
        # 5k-doc sf0.1 corpus into 156-doc tasks whose Arrow handshake
        # dominated (0.73 s vs 0.96 s).  The optimizer's sizeInBytes
        # estimate is available without running a job and scales with
        # the source files, so size the task count to ~bytes_per_task
        # of input each, clamped to session parallelism.  Unknown-size
        # sources (generated frames) estimate huge and clamp to
        # parallelism, which is the right default for them.
        est = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        target = min(target, max(1, est // bytes_per_task))
    if cap is not None:
        target = min(cap, target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def spread_for_compute(df, key: str | None = None):
    """CPU-spread guard for expression-heavy JVM stages (regex/char
    batteries, decimal aggregation, array dot products) — the twin of
    ``spread_for_python`` for pure-JVM compute.

    Why it exists (r9, measured): the driver's tables are written as ONE
    parquet row group per file, and a row group is the unit of scan
    splitting — ``maxPartitionBytes`` cannot cut below it, so every
    scan-rooted stage ran on a single core regardless of cluster size
    (doc_char_ratios spent 3.7 s of single-threaded regex at sf1.0 on
    local[32]).  Repartitioning costs one exchange of the input rows
    (~16 MB for the documents table) and buys full-cluster parallelism
    for the expensive projection/partial-aggregation above it.

    Scale behavior: fires ONLY when the scan under-decomposes (splits <
    session parallelism).  At production scale row-group counts exceed
    cores and this is a no-op — the payload never shuffles on the scale
    path (same discipline as spread_for_python).

    ``key``: hash-partition on a high-cardinality column instead of
    round-robin.  Round-robin repartition first LOCALLY SORTS its input
    (spark.sql.execution.sortBeforeRepartition, on by default so task
    retries are deterministic) — on the single-task scan this guard
    exists to fix, that sort is itself serial; hashing a unique key
    needs no sort and spreads evenly."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key is not None:
        from pyspark.sql import functions as F

        return df.repartition(target, F.col(key))
    return df.repartition(target)
