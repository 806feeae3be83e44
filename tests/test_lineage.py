"""Kill-and-resume: the north rule's mid-table resumability gate.

Simulates a crash after 3 day-units, resumes, and asserts the final
output is identical to an uninterrupted run and that no unit was
processed twice."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequali_spark.runtime import lineage
from tests.test_pipeline import pages_df


@pytest.fixture()
def pages(spark, pages_tiny):
    return pages_df(spark, pages_tiny)


def test_kill_and_resume(spark, pages, tmp_path):
    out = str(tmp_path / "labels")
    lin = str(tmp_path / "lineage")

    first = lineage.run_resumable(spark, pages, out, lin, max_units=3)
    assert len(first) == 3  # "crashed" after 3 units

    resumed = lineage.run_resumable(spark, pages, out, lin)
    assert set(first).isdisjoint(resumed)  # nothing reprocessed

    n_days = pages.select(F.to_date("warc_ts")).distinct().count()
    assert len(first) + len(resumed) == n_days

    # output identical to an uninterrupted run
    single_out = str(tmp_path / "labels_single")
    single_lin = str(tmp_path / "lineage_single")
    lineage.run_resumable(spark, pages, single_out, single_lin)
    a = spark.read.parquet(out).orderBy("url").drop("day").toPandas()
    b = spark.read.parquet(single_out).orderBy("url").drop("day").toPandas()
    assert a.drop(columns=["drop_reasons"]).equals(b.drop(columns=["drop_reasons"]))
    assert [list(x) for x in a["drop_reasons"]] == [list(x) for x in b["drop_reasons"]]

    # lineage counters reconcile with the table
    rep = lineage.lineage_report(spark, lin).collect()[0]
    assert rep["status"] == "done"
    assert rep["units"] == n_days
    assert rep["docs_seen"] == pages.count()
    assert rep["docs_kept"] == spark.read.parquet(out).filter("keep").count()


def test_rerun_is_idempotent(spark, pages, tmp_path):
    out = str(tmp_path / "labels")
    lin = str(tmp_path / "lineage")
    lineage.run_resumable(spark, pages, out, lin)
    again = lineage.run_resumable(spark, pages, out, lin)
    assert again == []  # everything already done
    # no duplicate rows in output
    total = spark.read.parquet(out).count()
    assert total == pages.count()


def test_concurrent_writers_on_disjoint_units(spark, pages, tmp_path):
    """Two drivers racing on DISJOINT units of the same table must
    compose: the lineage append is one atomically-renamed file per row
    (no shared mutable state) and each unit's write lands in its own
    day partition, so no coordination is required — the cluster-ready
    claim of the Iceberg seam's parquet fallback.  Simulated with two
    threads sharing the session (Spark supports concurrent job
    submission), each given a disjoint half of the days."""
    import threading

    out = str(tmp_path / "labels")
    lin = str(tmp_path / "lineage")
    days = sorted(
        str(r["d"])
        for r in pages.select(F.to_date("warc_ts").alias("d")).distinct().collect()
    )
    half = len(days) // 2
    assert half >= 1
    splits = [days[:half], days[half:]]
    results: list[list[str]] = [None, None]
    errors: list[Exception] = []

    def work(i):
        try:
            subset = pages.filter(
                F.to_date("warc_ts").cast("string").isin(splits[i])
            )
            results[i] = lineage.run_resumable(spark, subset, out, lin)
        except Exception as e:  # surfaced below — a bare thread death would hang asserts
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert sorted(results[0] + results[1]) == days
    assert set(results[0]).isdisjoint(results[1])
    # every unit done exactly once; output reconciles with the input
    assert lineage.completed_units(spark, lin) == set(days)
    assert spark.read.parquet(out).count() == pages.count()
    rep = lineage.lineage_report(spark, lin).collect()[0]
    assert rep["status"] == "done" and rep["units"] == len(days)
    assert rep["docs_seen"] == pages.count()


def test_force_units_overlap_last_writer_wins(spark, pages, tmp_path):
    """Two force_units re-runs of the SAME unit with different inputs:
    the second replacement wins, output never duplicates, and lineage
    keeps every attempt (append-only) while completed_units stays
    consistent."""
    out = str(tmp_path / "labels")
    lin = str(tmp_path / "lineage")
    lineage.run_resumable(spark, pages, out, lin)
    days = sorted(
        str(r["day"])
        for r in spark.read.parquet(out).select("day").distinct().collect()
    )
    target = days[0]
    target_urls = sorted(
        r["url"]
        for r in pages.filter(F.to_date("warc_ts") == target).select("url").collect()
    )
    # writer 1 keeps the first half, writer 2 (last) keeps the first 3
    input_1 = pages.filter(
        (F.to_date("warc_ts") != target)
        | F.col("url").isin(target_urls[: len(target_urls) // 2])
    )
    input_2 = pages.filter(
        (F.to_date("warc_ts") != target) | F.col("url").isin(target_urls[:3])
    )
    assert lineage.run_resumable(spark, input_1, out, lin, force_units=[target]) == [target]
    assert lineage.run_resumable(spark, input_2, out, lin, force_units=[target]) == [target]

    after = spark.read.parquet(out)
    # last writer wins: the unit's partition holds exactly input_2's docs
    assert after.filter(F.col("day") == target).count() == 3
    assert after.count() == input_2.count()
    # lineage is append-only history: 3 attempts recorded, one unit set
    attempts = (
        lineage._lineage_rows(spark, lin).filter(F.col("unit") == target).count()
    )
    assert attempts == 3
    assert lineage.completed_units(spark, lin) == set(days)


def test_force_rerun_replaces_unit_output(spark, pages, tmp_path):
    """MERGE-by-replacement on the parquet fallback: re-running one unit
    with CHANGED input replaces that unit's partition exactly (no
    duplicates, new content visible), leaving other units untouched —
    the TableIO/Iceberg overwritePartitions contract."""
    out = str(tmp_path / "labels")
    lin = str(tmp_path / "lineage")
    lineage.run_resumable(spark, pages, out, lin)
    before = spark.read.parquet(out)
    # partition-column inference reads `day` back as DATE; lineage units
    # are the string form
    days = sorted(str(r["day"]) for r in before.select("day").distinct().collect())
    target = days[0]
    n_target_before = before.filter(F.col("day") == target).count()
    other_before = before.filter(F.col("day") != target).count()

    # changed input: drop half the target day's docs (sorted-url halves
    # are deterministic), keep other days identical
    target_urls = sorted(
        r["url"]
        for r in pages.filter(F.to_date("warc_ts") == target).select("url").collect()
    )
    keep_urls = set(target_urls[: len(target_urls) // 2])
    changed = pages.filter(
        (F.to_date("warc_ts") != target) | F.col("url").isin(list(keep_urls))
    )

    redone = lineage.run_resumable(spark, changed, out, lin, force_units=[target])
    assert redone == [target]

    after = spark.read.parquet(out)
    assert after.filter(F.col("day") == target).count() == len(keep_urls)
    assert after.filter(F.col("day") != target).count() == other_before
    # output rows == changed input rows: replaced exactly, never appended
    # (the fixture plants one duplicate url by design, so compare counts
    # against the input rather than asserting url uniqueness)
    assert after.count() == changed.count()
    assert n_target_before > len(keep_urls)  # the replacement actually shrank it


def test_file_fingerprint_listing_path_and_fallback(spark, tmp_path):
    """file_fingerprint (r8): file-backed frames fingerprint from the
    (path, length, mtime) listing with no data scan; a rewrite — even
    same row content — changes it; non-file-backed frames fall back to
    the content scan; and the persist() ordering trap takes the
    fallback (still correct, just slower)."""
    from sequali_spark.runtime.checkpoint import file_fingerprint

    p = str(tmp_path / "t")
    spark.range(100).selectExpr("id", "cast(id as string) as s").write.parquet(p)
    df = spark.read.parquet(p)
    fp1 = file_fingerprint(df, "id", "s")
    assert fp1.startswith("files:")
    assert file_fingerprint(spark.read.parquet(p), "id", "s") == fp1

    # in-place rewrite (identical rows) -> listing changes -> invalidates
    spark.range(100).selectExpr("id", "cast(id as string) as s").write.mode(
        "overwrite"
    ).parquet(p)
    fp2 = file_fingerprint(spark.read.parquet(p), "id", "s")
    assert fp2.startswith("files:") and fp2 != fp1

    # non-file-backed -> content fallback (rowcount:hashsum format)
    mem = spark.createDataFrame([(1, "a")], "id long, s string")
    assert not file_fingerprint(mem, "id", "s").startswith("files:")

    # the ordering trap: a registered cache hides the file scan
    cached = spark.read.parquet(p).persist()
    try:
        assert not file_fingerprint(cached, "id", "s").startswith("files:")
    finally:
        cached.unpersist()
