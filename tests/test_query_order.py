"""Pin the driver-judged 50-query prefix of ``queries()``.

Round-8 single-slot rotation (VERDICT r7 task 3): slot 11 swaps
doc_length_percentiles (green r1-r7; A14 keeps doc_n50_report
in-window) for doc_log_length_histogram — A16's log re-binning,
judged only via the mirror until now.  The other 49 slots are
byte-identical to the r7 window, so CORRECTNESS_r08 diffs against r07
in exactly one key.  (r7 rotation: events_type_daily_pivot out,
doc_alpha_ratio_histogram in; r6: doc_length_histogram out,
doc_decontaminate_winnow in.)

The driver checks exactly the FIRST 50 entries.  CORRECTNESS_r01-r03
judged the pre-rotation prefix; the prefix pinned here (rotated in
round 4) is first judged in CORRECTNESS_r04 — diffing r4 against
earlier rounds key-for-key is expected to show the six rotated pairs.
This test freezes the intended prefix so a future query addition can't
silently evict a judged query, and asserts the window invariants:
every windowed entry is oracle-backed, and every oracle-backed entry
outside the window is in the documented overflow set.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

DRIVER_WINDOW = 50

# The intended judged set, in order.  Change DELIBERATELY (and update the
# ordering comment on queries()) — never as a side effect of adding a query.
# Round-4 rotation (VERDICT r3 task 1): the five never-driver-judged r3
# additions plus the new perplexity surrogate moved in; six thrice-green
# redundant siblings moved out to overflow.
EXPECTED_PREFIX = [
    "doc_char_ratios",
    "doc_decontaminate_winnow",
    "doc_per_source_quality",
    "doc_substring_scan",
    "doc_quality_score",
    "doc_overrep_shingles",
    "doc_position_char_profile",
    "doc_per_source_deviation",
    "doc_top_per_source",
    "doc_deterministic_sample",
    "doc_log_length_histogram",
    "doc_token_count_bpeish",
    "doc_type_token_ratio",
    "doc_n50_report",
    "doc_winnow_sql",
    "doc_source_mixture_weights",
    "doc_boilerplate_id",
    "doc_corpus_summary",
    "doc_token_zipf_mass",
    "doc_ppl_surprisal_histogram",
    "doc_decontaminate",
    "dedup_exact_groups",
    "dedup_fingerprint_histogram",
    "events_hourly_report",
    "events_daily_cumulative",
    "events_sessionize",
    "events_top_users",
    "doc_alpha_ratio_histogram",
    "events_asof_join",
    "events_props_json",
    "events_gap_stats",
    "events_funnel",
    "events_retention",
    "events_value_percentiles",
    "events_hourly_anomaly",
    "rel_pricing_summary",
    "rel_top_unshipped",
    "rel_customers_no_orders",
    "rel_pricing_rollup",
    "rel_value_band_join",
    "rel_region_revenue",
    "rel_part_type_share",
    "pages_time_window",
    "pages_host_report",
    "pages_distinct_urls_salted",
    "media_kind_stats",
    "media_frame_sample",
    "emb_norms",
    "emb_brute_force_topk",
    "emb_knn_label_vote",
]

# Oracle-backed queries that deliberately sit past the window (redundant
# multi-round-green siblings; operators stay pinned by the parity mirror).
EXPECTED_OVERFLOW = {
    "doc_length_cumdist",
    # r8 single-slot rotation: doc_length_percentiles (green r1-r7)
    # out, doc_log_length_histogram (A16) in
    "doc_length_percentiles",
    # r7 single-slot rotation: events_type_daily_pivot (green r4-r6)
    # out, doc_alpha_ratio_histogram (A4) in
    "events_type_daily_pivot",
    "doc_bottom_decile",
    "doc_probe_position_curve",
    "doc_word_stats",
    "doc_lang_histogram",
    "doc_stopword_fraction",
    "doc_stratified_sample",
    "events_type_totals",
    "rel_order_priority",
    # r6 single-slot rotation: doc_length_histogram (green r1-r5) out,
    # doc_decontaminate_winnow (the only oracle with no driver row) in
    "doc_length_histogram",
    # r8 addition: paragraph-level dedup + reconstruction — new oracle,
    # mirror-swept this round, window-rotation candidate for r9
    "doc_paragraph_dedup",
    # r8 additions: Gopher/MassiveText structure rules — new oracles,
    # mirror-swept this round, window-rotation candidates for r9
    "doc_gopher_line_stats",
    "doc_dup_line_chars",
    "doc_top_bigram_mass",
    "doc_dup_ngram_mass",
}


def test_driver_prefix_is_pinned():
    names = list(entry_mod.queries())
    assert names[:DRIVER_WINDOW] == EXPECTED_PREFIX


def test_every_windowed_query_is_oracle_backed():
    names = list(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    missing = [n for n in names[:DRIVER_WINDOW] if n not in oracles]
    assert not missing, f"windowed queries without an oracle: {missing}"


def test_oracle_backed_overflow_is_exactly_the_documented_set():
    names = list(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    overflow = {n for n in names[DRIVER_WINDOW:] if n in oracles}
    assert overflow == EXPECTED_OVERFLOW


def test_no_dangling_oracles():
    assert not set(entry_mod.oracle_sql()) - set(entry_mod.queries())


def test_inventory_counts_match_docs():
    """README/COVERAGE advertise these totals; keep them honest."""
    assert len(entry_mod.queries()) == 83
    assert len(entry_mod.oracle_sql()) == 67


def test_token_zipf_mass_degenerate_docs_cross_engine(spark, tmp_path):
    """Whitespace-only and single-token docs exercise the split
    semantics (consecutive spaces yield EMPTY tokens, counted by both
    engines identically) — the cross-engine edge the sf corpora don't
    contain."""
    import duckdb

    d = tmp_path / "zipf"
    spark.createDataFrame(
        [(0, "a a b", "s1", 5), (1, "   ", "s1", 3), (2, "", "s2", 0), (3, "b", "s2", 1)],
        schema="doc_id long, text string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))

    from sequali_spark.operators.textqc import token_zipf_mass

    got = {
        r["source"]: (r["tokens"], r["zipf_mass"], r["mean_tok_freq_ppm"])
        for r in token_zipf_mass(spark, str(d)).collect()
    }
    con = duckdb.connect()
    # Spark writes a part-file directory; duckdb needs the glob
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(entry_mod.oracle_sql()["doc_token_zipf_mass"]).fetchall()
    }
    assert got == oracle
    # hand-check: s1 = [a,a,b] + 4 empty tokens; s2 = [b]
    assert got["s1"][0] == 7 and got["s2"][0] == 1
    # mass(s2) = freq_global(b) = 2
    assert got["s2"][1] == 2


def test_ppl_surprisal_histogram_degenerate_docs_cross_engine(spark, tmp_path):
    """Whitespace-only / single-token / repeated-token docs pin the
    split semantics and the integer floor-log2 chain against the DuckDB
    oracle on inputs the sf corpora don't contain."""
    import duckdb

    from sequali_spark.operators.textqc import ppl_surprisal_histogram

    d = tmp_path / "ppl"
    spark.createDataFrame(
        [
            (0, "a a a a", "s1", 7),
            (1, "a b", "s1", 3),
            (2, "   ", "s1", 3),  # whitespace-only: 4 empty tokens
            (3, "", "s2", 0),  # filtered (length 0)
            (4, "zz", "s2", 2),  # singleton token
        ],
        schema="doc_id long, text string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))

    got = [
        (r["source"], r["surprisal_bits"], r["docs"])
        for r in ppl_surprisal_histogram(spark, str(d)).collect()
    ]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    oracle = con.sql(entry_mod.oracle_sql()["doc_ppl_surprisal_histogram"]).fetchall()
    assert got == [tuple(r) for r in oracle]
    # hand-check: T=11 tokens (5 a, 1 b, 4 empty, 1 zz).
    # doc 0: tok_bits(a)=floor(log2(11//5))=1 -> mean 1
    # doc 4: tok_bits(zz)=floor(log2(11))=3 -> mean 3
    by = {(s, b): n for s, b, n in got}
    assert by[("s1", 1)] >= 1 and by[("s2", 3)] == 1


def test_ppl_surprisal_tracks_hashed_lm_direction(spark, tmp_path):
    """The oracle-checked surrogate must rank docs the same way as the
    hashed-LM perplexity scorer on a clear common-vs-gibberish split —
    the directional link that makes it an honest companion check."""
    from sequali_spark.functions.perplexity import get_model
    from sequali_spark.operators.textqc import ppl_surprisal_histogram

    common = "the data table holds the data stream and the data query"
    gibberish = "xqzv qvxk zkqj vjxq kzvq jxqz qxvz vzkq"
    rows = [(i, common, "common", len(common)) for i in range(8)]
    rows.append((100, gibberish, "rare", len(gibberish)))
    d = tmp_path / "ppl_dir"
    spark.createDataFrame(
        rows, schema="doc_id long, text string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    buckets = {
        r["source"]: r["surprisal_bits"]
        for r in ppl_surprisal_histogram(spark, str(d)).collect()
    }
    assert buckets["rare"] > buckets["common"]
    m = get_model()
    assert m.perplexity(gibberish) > m.perplexity(common)


def test_hourly_anomaly_flags_planted_spike(spark, tmp_path):
    """Steady 10 events/hour with one 120-event hour: the integer
    k-sigma test must flag exactly the spike (constant trailing series
    has zero variance, so steady hours give 0 > 0 = false)."""
    import datetime

    from sequali_spark.operators.events import hourly_anomaly

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for h in range(30):
        n = 120 if h == 25 else 10
        for i in range(n):
            rows.append((base + datetime.timedelta(hours=h, seconds=i), "click"))
    d = tmp_path / "ev"
    spark.createDataFrame(rows, schema="ts timestamp, event_type string").write.parquet(
        str(d / "events.parquet")
    )
    got = {r["hour"].hour + 24 * (r["hour"].day - 1): r for r in hourly_anomaly(spark, str(d)).collect()}
    assert got[25]["is_spike"] is True
    # warmed-up steady hours before the spike are NOT flagged
    assert all(got[h]["is_spike"] is False for h in range(12, 25))
    # pre-warmup hours are NULL (insufficient trailing slots)
    assert got[5]["is_spike"] is None


def test_hourly_anomaly_matches_pure_python_integers(spark, tmp_path):
    """The windowed k-sigma decision must equal a from-scratch Python
    big-integer recomputation on a random series — pinning the decimal
    cast chain (19,0 products, 38,0 squares, width-reduced k^2 factor)
    against arbitrary-precision ground truth."""
    import datetime
    import random

    from sequali_spark.operators.events import hourly_anomaly

    rng = random.Random(13)
    base = datetime.datetime(2024, 3, 1)
    counts = [rng.randint(1, 40) for _ in range(120)]
    rows = []
    for h, n in enumerate(counts):
        for i in range(n):
            rows.append((base + datetime.timedelta(hours=h, seconds=i), "view"))
    d = tmp_path / "ev2"
    spark.createDataFrame(rows, schema="ts timestamp, event_type string").write.parquet(
        str(d / "events.parquet")
    )

    got = {
        (r["hour"] - base).total_seconds() // 3600: r["is_spike"]
        for r in hourly_anomaly(spark, str(d)).collect()
    }
    for h, x in enumerate(counts):
        trail = counts[max(0, h - 24) : h]
        n = len(trail)
        if n < 12:
            expected = None
        else:
            s, sq = sum(trail), sum(v * v for v in trail)
            expected = (n * x - s) ** 2 > 9 * (n * sq - s * s)
        assert got[h] == expected, (h, x, trail)


def test_pivot_n_other_catches_vocabulary_drift(spark, tmp_path):
    """An event type outside the static pivot vocabulary (including
    NULL) must surface in n_other — on BOTH engines — instead of
    silently vanishing from the report."""
    import datetime

    import duckdb

    from sequali_spark.operators.events import event_type_hourly_pivot

    base = datetime.datetime(2024, 5, 1)
    rows = [
        (base, "click"),
        (base + datetime.timedelta(minutes=1), "refund"),  # drifted type
        (base + datetime.timedelta(minutes=2), None),  # null type
        (base + datetime.timedelta(days=1), "view"),
    ]
    d = tmp_path / "ev_drift"
    spark.createDataFrame(rows, schema="ts timestamp, event_type string").write.parquet(
        str(d / "events.parquet")
    )
    got = {r["day"]: r.asDict() for r in event_type_hourly_pivot(spark, str(d)).collect()}
    assert got[base]["n_click"] == 1 and got[base]["n_other"] == 2
    assert got[base + datetime.timedelta(days=1)]["n_view"] == 1
    assert got[base + datetime.timedelta(days=1)]["n_other"] == 0

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
    oracle = {r[0]: r for r in con.sql(entry_mod.oracle_sql()["events_type_daily_pivot"]).fetchall()}
    assert oracle[base][-1] == 2 and oracle[base + datetime.timedelta(days=1)][-1] == 0

    # vocabulary guards: empty, and a name colliding with the canary
    import pytest

    with pytest.raises(ValueError):
        event_type_hourly_pivot(spark, str(d), event_types=())
    with pytest.raises(ValueError, match="n_other"):
        event_type_hourly_pivot(spark, str(d), event_types=("click", "other"))


def test_windowed_queries_emit_integer_domains_only(spark, sf_dir):
    """The r1/r2 hash-fail class: DECIMAL (and fractional DOUBLE/FLOAT)
    output columns hash differently across engine bindings even when the
    typed values are bit-identical (pandas coerces DECIMAL->float64).
    Ban them from every driver-judged query's schema: money is BIGINT
    cents, ratios are basis points."""
    from pyspark.sql.types import DecimalType, DoubleType, FloatType

    qs = entry_mod.queries()
    offenders = {}
    for name in EXPECTED_PREFIX:
        schema = qs[name](spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (DecimalType, DoubleType, FloatType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-integer output columns in judged queries: {offenders}"


def test_gopher_line_stats_degenerate_docs_cross_engine(spark, tmp_path):
    """Bullets, ellipses (ASCII and U+2026), '#' symbols, letterless
    words, trailing newlines, and consecutive spaces — the structure
    the sf corpora's single-line all-alpha docs never exercise.  Pins
    Spark's split/higher-order-filter semantics against the DuckDB
    list_filter oracle character-for-character."""
    import duckdb

    import __spark_entry__ as em
    from sequali_spark.operators.textqc import gopher_line_stats

    docs = [
        (0, "- item one\n- item two\nplain text line", "s", 0),
        (1, "to be continued...\nor not…\nfinal", "s", 0),
        (2, "#tag #tag2 price... 123 456", "s", 0),  # letterless words + symbols
        (3, "trailing newline\n", "s", 0),  # split keeps the empty tail
        (4, "a  b", "s", 0),  # consecutive spaces -> empty word
        (5, "....", "s", 0),  # overlapping-ellipsis: ONE replace, 1 residual char
        (6, "", "s", 0),  # filtered out
        (7, "• bullet unicode\n* star", "s", 0),
    ]
    d = tmp_path / "gopher"
    spark.createDataFrame(
        docs, schema="doc_id long, text string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    got = [tuple(r) for r in gopher_line_stats(spark, str(d)).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    oracle = [tuple(r) for r in con.sql(em.oracle_sql()["doc_gopher_line_stats"]).fetchall()]
    assert got == oracle
    by = {r[0]: r for r in got}
    # doc 0: 2 of 3 lines are bullets -> 6666 bps
    assert by[0][2] == 6666
    # doc 1: 2 of 3 lines end in an ellipsis (one unicode)
    assert by[1][3] == 6666
    # doc 2: words = [#tag, #tag2, price..., 123, 456] -> 3 alpha of 5;
    # symbols = 2 hashes + 1 ellipsis = 3 of 5 words
    assert by[2][4] == 6000 and by[2][5] == 6000
    # doc 3: trailing newline -> split keeps the empty tail line (2 lines)
    assert by[3][1] == 2
    # doc 4: 'a  b' -> 3 words (one empty), 2 alpha
    assert by[4][4] == 6666
    # doc 5: '....' -> one non-overlapping '...' match, 1 word, 0 alpha
    assert by[5][5] == 10000 and by[5][4] == 0
    # doc 7: unicode bullet and star both count
    assert by[7][2] == 10000


def test_dup_line_chars_degenerate_docs_cross_engine(spark, tmp_path):
    """Repeated lines of unequal length, empty-line runs, and a
    no-duplicate doc — pins the two-level aggregation against the
    DuckDB oracle and hand-computed fractions."""
    import duckdb

    import __spark_entry__ as em
    from sequali_spark.operators.textqc import dup_line_chars

    docs = [
        # 'abcd' x3 (12 chars dup->8) + 'xy' (2) : dup 8 of 14
        (0, "abcd\nabcd\nxy\nabcd", "s", 0),
        (1, "one\ntwo\nthree", "s", 0),  # no dups
        (2, "\n\n\nsolo\n\n", "s", 0),  # empty lines ignored
        (3, "", "s", 0),  # filtered (no output row: zero nonempty lines)
    ]
    d = tmp_path / "dupline"
    spark.createDataFrame(
        docs, schema="doc_id long, text string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    got = [tuple(r) for r in dup_line_chars(spark, str(d)).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    oracle = [tuple(r) for r in con.sql(em.oracle_sql()["doc_dup_line_chars"]).fetchall()]
    assert got == oracle
    by = {r[0]: r for r in got}
    assert by[0] == (0, 4, 2, 14, 5714)  # floor(10000*8/14)
    assert by[1][4] == 0
    assert by[2] == (2, 1, 1, 4, 0)
    assert 3 not in by


def test_top_bigram_mass_degenerate_docs_cross_engine(spark, tmp_path):
    """Repeated bigrams, single-word docs (filtered — sequence(0,-1)
    would otherwise generate a DESCENDING range), consecutive spaces
    (empty words join into short grams), and count-ties between
    different-length grams (settled by char mass, no text tie-break)."""
    import duckdb

    import __spark_entry__ as em
    from sequali_spark.operators.textqc import top_bigram_mass

    docs = [
        (0, "ab ab ab ab", "s", 0),  # 'ab ab' x3 -> mass 15 over n=11
        (1, "hello", "s", 0),  # one word: filtered
        (2, "a  b", "s", 0),  # words [a,'',b] -> grams 'a ', ' b'
        (3, "x y x y x", "s", 0),  # 'x y' x2 vs 'y x' x2 -> mass 6
        (4, "", "s", 0),  # filtered
    ]
    d = tmp_path / "bigram"
    spark.createDataFrame(
        docs, schema="doc_id long, text string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    got = [tuple(r) for r in top_bigram_mass(spark, str(d)).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    oracle = [tuple(r) for r in con.sql(em.oracle_sql()["doc_top_bigram_mass"]).fetchall()]
    assert got == oracle
    by = {r[0]: r for r in got}
    assert by[0] == (0, 3, 15, 13636)  # floor(10000*15/11)
    assert 1 not in by and 4 not in by
    assert by[2] == (2, 2, 2, 5000)
    assert by[3] == (3, 4, 6, 6666)


def test_dup_ngram_mass_degenerate_docs_cross_engine(spark, tmp_path):
    """Fully-repeated 5-grams, a doc with exactly 5 words (one gram,
    never 'duplicated'), and a 4-word doc (filtered) — pins the c>1
    conditional mass against the DuckDB oracle and hand math."""
    import duckdb

    import __spark_entry__ as em
    from sequali_spark.operators.textqc import dup_ngram_mass

    docs = [
        (0, "a b c d e a b c d e a b c d e", "s", 0),  # 'a b c d e' repeats
        (1, "v w x y z", "s", 0),  # exactly one gram, c=1 -> dup 0
        (2, "p q r s", "s", 0),  # 4 words: filtered
        (3, "", "s", 0),  # filtered
    ]
    d = tmp_path / "dupgram"
    spark.createDataFrame(
        docs, schema="doc_id long, text string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    got = [tuple(r) for r in dup_ngram_mass(spark, str(d)).collect()]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    oracle = [tuple(r) for r in con.sql(em.oracle_sql()["doc_dup_ngram_mass"]).fetchall()]
    assert got == oracle
    by = {r[0]: r for r in got}
    # doc 0: 15 words -> 11 grams over a period-5 word cycle, so only 5
    # DISTINCT grams exist (counts 3+2+2+2+2) and every gram is a
    # duplicate: dup mass = total mass = 11 grams x 9 chars
    assert by[0] == (0, 11, 99, 10000)
    assert by[1] == (1, 1, 0, 0)
    assert 2 not in by and 3 not in by
