"""Pin the bench artifact contract (VERDICT r7 task 4).

The driver records bench.py's final stdout line as BENCH_r{N}.json's
``parsed`` field, capturing only the tail of stdout (~2000 chars).
BENCH_r06.json went ``parsed: null`` SILENTLY because the per-sample
noise forensics outgrew that capture; r7 fixed it by convention
(compact final line + BENCH/last_run.json for forensics).  This test
makes the convention executable: the compact dict, built exactly the
way run_headline builds it (bench.build_compact_result) on a synthetic
result of the real headline's shape, must serialize well under the
capture limit and round-trip through json.loads.
"""

from __future__ import annotations

import json

from bench import build_compact_result

# the real 13-query headline surface (names matter: they dominate the
# serialized size) with worst-plausible value widths
HEADLINE_QUERIES = [
    "doc_char_ratios",
    "doc_quality_score",
    "doc_overrep_shingles",
    "dedup_fingerprint_histogram",
    "dedup_minhash_pairs",
    "events_hourly_report",
    "events_sessionize",
    "emb_brute_force_topk",
    "emb_lsh_topk",
    "rel_pricing_summary",
    "rel_top_unshipped",
    "pages_quality_labels",
    "pipeline_64k_pages",
]


def test_compact_line_fits_capture_and_round_trips():
    per_query = {name: 123.456 for name in HEADLINE_QUERIES}
    compact = build_compact_result(
        per_query,
        sf=0.1,
        pipeline_rows=64_000,
        pipe_sec=1.234,
        cpus=32,
        load_gated=True,
    )
    line = json.dumps(compact)
    # well under the driver's ~2000-char tail capture, with headroom
    # for a few added queries
    assert len(line) < 1500, f"compact line grew to {len(line)} chars"
    assert json.loads(line) == compact
    # the driver greps for these fields
    assert compact["metric"] == "headline_queries_total_sec"
    assert compact["unit"] == "sec"
    assert compact["value"] == round(sum(per_query.values()), 3)
    assert set(compact["queries"]) == set(HEADLINE_QUERIES)


def test_compact_line_has_no_forensics_keys():
    """The failure class: per-sample forensics creeping back into the
    stdout line instead of BENCH/last_run.json."""
    compact = build_compact_result(
        {n: 1.0 for n in HEADLINE_QUERIES}, 0.1, 64_000, 1.0, 32, False
    )
    forbidden = {
        "query_samples",
        "sample_pre_busy_frac",
        "sample_steal_frac",
        "load_gate",
    }
    assert not forbidden & set(compact)


def test_scan_split_default_pins_arrow_sized_splits(monkeypatch):
    """The 16 MB maxPartitionBytes default is a measured perf guard
    (2M docs / local[8]: bare minhash Arrow stage 341 s at 128 MB
    splits vs 245 s at 16 MB — see session.py rationale); pin it and
    its override so a config refactor can't silently regress it."""
    from sequali_spark.session import (
        DEFAULT_MAX_PARTITION_BYTES,
        max_partition_bytes,
    )

    monkeypatch.delenv("SPARK_GRAFT_MAX_PARTITION_BYTES", raising=False)
    assert DEFAULT_MAX_PARTITION_BYTES == 16 * 1024 * 1024
    assert max_partition_bytes() == str(16 * 1024 * 1024)
    monkeypatch.setenv("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728")
    assert max_partition_bytes() == "134217728"


def test_live_session_wires_scan_split_default(spark):
    assert (
        spark.conf.get("spark.sql.files.maxPartitionBytes") == "16777216"
    )
