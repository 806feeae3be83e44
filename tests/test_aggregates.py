"""Spark corpus aggregates vs the independent pandas oracle report.

The oracle computes the same aggregates with plain pandas
(sequali_spark.oracle.oracle_report) — an independent implementation,
so exact agreement here is a genuine cross-check, like sequali's
scripts/fingerprinter.py vs DedupEstimator."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sequali_spark.fixtures import N_HOSTS, _host_boilerplate
from sequali_spark.operators import aggregates as agg
from sequali_spark.oracle import oracle_metrics, oracle_report
from sequali_spark.pipeline import quality_pipeline
from tests.test_pipeline import pages_df


@pytest.fixture(scope="module")
def metric_df(spark, pages_small):
    df = quality_pipeline(spark, pages_df(spark, pages_small))
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def golden_report(pages_small):
    return oracle_report(oracle_metrics(pages_small))


def test_corpus_counters_exact(metric_df, golden_report):
    row = agg.corpus_counters(metric_df).first()
    assert row["docs_seen"] == golden_report["docs_seen"]
    assert row["docs_kept"] == golden_report["docs_kept"]
    assert row["docs_scrubbed"] == golden_report["docs_scrubbed"]


def test_rule_hits_exact(metric_df, golden_report):
    got = {r["rule"]: r["hits"] for r in agg.rule_hit_counts(metric_df).collect()}
    assert got == golden_report["rule_hits"]


def test_lang_histogram_exact(metric_df, golden_report):
    got = {r["lang"]: r["docs"] for r in agg.lang_histogram(metric_df).collect()}
    assert got == golden_report["lang_hist"]


def test_duplication_histogram_exact(metric_df, golden_report):
    got = {
        r["dup_count"]: r["n_fingerprints"]
        for r in agg.duplication_histogram(metric_df).collect()
    }
    assert got == golden_report["duplication_hist"]
    frac = agg.estimated_unique_fraction(metric_df).first()["unique_fraction"]
    assert abs(frac - golden_report["estimated_unique_fraction"]) < 1e-12


def test_overrepresented_exact(metric_df, golden_report):
    got = [
        (r["shingle"], r["count"])
        for r in agg.overrepresented_shingles(metric_df, min_count=3, top_k=100).collect()
    ]
    want = [(o["shingle"], o["count"]) for o in golden_report["overrepresented"]]
    assert got == want


def test_identify_overrepresented(spark, metric_df):
    bp = spark.createDataFrame(
        pd.DataFrame(
            {
                "name": [f"host{h:03d}_boilerplate" for h in range(N_HOSTS)],
                "content": [_host_boilerplate(h) for h in range(N_HOSTS)],
            }
        )
    )
    overrep = agg.overrepresented_shingles(metric_df, min_count=3, top_k=50)
    ident = agg.identify_overrepresented(overrep, bp).collect()
    assert len(ident)
    # planted boilerplate shingles should be identified
    matched = [r for r in ident if r["best_match"] is not None]
    assert matched, "no overrepresented shingle matched the boilerplate DB"


def test_per_host_report(metric_df, pages_small):
    rows = agg.per_host_report(metric_df).collect()
    hosts = {r["host"]: r for r in rows}
    assert sum(r["docs"] for r in rows) == len(pages_small)
    # zipf skew: host000 is the mega-host
    assert rows[0]["host"] == "host000.example.org"
    assert all(0.0 <= r["keep_rate"] <= 1.0 for r in rows)
    assert len(hosts) <= N_HOSTS


def test_time_window_report(metric_df, pages_small):
    rows = agg.time_window_report(metric_df, "1 day").collect()
    assert sum(r["docs"] for r in rows) == len(pages_small)
    assert all(r["distinct_hosts"] >= 1 for r in rows)
    # 30-day fixture window -> about 30 buckets
    assert 25 <= len(rows) <= 31


def test_length_distribution_and_n50(metric_df, pages_small):
    dist = agg.length_distribution(metric_df).collect()
    assert dist[-1]["cum_doc_frac"] == 1.0
    assert dist[-1]["cum_char_frac"] == 1.0
    n = agg.n50_analogue(metric_df).first()
    lens = sorted(pages_small["text"].str.len())
    total = sum(lens)
    cum, n50, n90 = 0, None, None
    for length in lens:
        cum += length
        if n90 is None and cum * 10 >= total:
            n90 = length
        if cum * 2 >= total:
            n50 = length
            break
    assert n["n50_length"] == n50
    # reference semantics: N90 = 10% ascending crossing -> n90 <= n50
    assert n["n90_length"] == n90
    assert n["n90_length"] <= n["n50_length"]
