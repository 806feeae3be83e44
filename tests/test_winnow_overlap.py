"""r7 winnow hardening: (1) the vectorized posting explosion is
bit-identical to the per-element reference loop; (2) the groupBy +
broadcast-anti-join stop-fingerprint guard is equivalent to the old
count-over-window guard; (3) no Window node survives in the plan."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sequali_spark.operators import dedup

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR_TINY", "/root/testdata/sf0.001")


def test_winnow_postings_vectorized_identity(spark):
    """np.repeat/concatenate explosion == per-(id, fp) append loop."""
    from sequali_spark.functions.kernels import winnow_fingerprints

    docs = dedup.load(spark, SF_DIR, "documents").limit(200)
    got = (
        dedup.winnow_postings(docs)
        .orderBy("doc_id", "fp")
        .toPandas()
    )
    # reference: the pre-r7 per-element loop
    pdf = docs.select("doc_id", "text").toPandas()
    ids, fps = [], []
    for doc_id, t in zip(pdf["doc_id"], pdf["text"]):
        for fp in winnow_fingerprints((t or "").encode("utf-8")):
            ids.append(doc_id)
            fps.append(int(fp))
    want = (
        pd.DataFrame({"doc_id": ids, "fp": fps})
        .sort_values(["doc_id", "fp"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["fp"].to_numpy() == want["fp"].to_numpy()).all()


def test_winnow_postings_empty_and_short_docs(spark):
    """Docs below k chars emit zero postings; the numpy concatenate path
    must survive a batch that is all-empty."""
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ab"), (4, "x" * 200)],
        schema="doc_id long, text string",
    )
    got = dedup.winnow_postings(docs).groupBy("doc_id").count().toPandas()
    got = dict(zip(got["doc_id"], got["count"]))
    assert 1 not in got and 2 not in got and 3 not in got
    assert got.get(4, 0) >= 1


def _window_guard_pairs(spark, sf_dir, min_shared=3, max_postings=64):
    """The pre-r7 implementation, kept as the equivalence reference:
    count-over-window skew guard (materializes each fingerprint's full
    posting list on one task — the pathology the rewrite removes)."""
    d = dedup.load(spark, sf_dir, "documents")
    posts = dedup.winnow_postings(d)
    post_w = W.partitionBy("fp")
    posts = (
        posts.withColumn("_n", F.count("*").over(post_w))
        .filter(F.col("_n") <= max_postings)
        .drop("_n")
    )
    l, r = posts.alias("l"), posts.alias("r")
    return (
        l.join(
            r,
            (F.col("l.fp") == F.col("r.fp")) & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def test_anti_join_guard_equivalent_to_window_guard(spark):
    new = dedup.winnow_overlap_pairs(spark, SF_DIR).toPandas()
    old = (
        _window_guard_pairs(spark, SF_DIR)
        .orderBy(F.desc("shared_fps"), "doc_a", "doc_b")
        .toPandas()
    )
    assert len(new) == len(old)
    for col in ("doc_a", "doc_b", "shared_fps"):
        assert (new[col].to_numpy() == old[col].to_numpy()).all(), col


def test_winnow_overlap_plan_has_no_window(spark):
    plan = (
        dedup.winnow_overlap_pairs(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, "skew guard must not be a count-over-window"
    # the hot-set guard is an anti-join with NO forced broadcast hint
    # (ADVICE r7: a template-heavy corpus can push millions of
    # fingerprints over the cap); AQE picks broadcast at runtime when
    # the measured hot set is small, shuffle anti-join when it is not
    assert "LeftAnti" in plan, "hot-fingerprint guard must be an anti-join"
