"""Paragraph-level corpus dedup + document reconstruction
(dedup.paragraph_dedup): (1) exact semantics on a hand-built corpus
with planted cross-doc and within-doc duplicate paragraphs; (2) the
no-duplicates identity (reconstruction is byte-exact); (3) a
fully-duplicated document survives as an empty row; (4) partition
invariance; (5) no Window node in the plan (the election must be the
map-side-combining groupBy argmin, never a window over the paragraph
key — a boilerplate paragraph duplicated 10^8 times is ONE window
partition)."""

from __future__ import annotations

import pytest

from sequali_spark.operators.dedup import paragraph_dedup


def _words(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def _run(df, wpp=3):
    out = paragraph_dedup(df, words_per_para=wpp)
    return {r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_dedup"]) for r in out.collect()}


def test_planted_duplicates_exact(spark):
    # 3-word paragraphs.  doc 0: A B; doc 1: B C (B is a cross-doc dup,
    # first seen in doc 0 at pid 1); doc 2: D D E (within-doc dup: the
    # second D drops); doc 3 == doc 0 (fully duplicated -> emptied).
    A, B, C, D, E = (_words(t, 3) for t in "abcde")
    rows = [
        (0, f"{A} {B}"),
        (1, f"{B} {C}"),
        (2, f"{D} {D} {E}"),
        (3, f"{A} {B}"),
    ]
    got = _run(_docs(spark, rows))
    assert got[0] == (2, 2, f"{A} {B}")
    assert got[1] == (2, 1, C)
    assert got[2] == (3, 2, f"{D} {E}")
    assert got[3] == (2, 0, "")


def test_no_duplicates_is_identity(spark, sf_dir):
    # Make every paragraph globally unique by prefixing doc_id into
    # each word: reconstruction must reproduce the text byte-for-byte.
    rows = [(i, _words(f"d{i}w", 7)) for i in range(20)]
    got = _run(_docs(spark, rows), wpp=3)
    for i, text in rows:
        n_paras, n_kept, out = got[i]
        assert n_paras == 3 and n_kept == 3  # 7 words -> 3+3+1
        assert out == text


def test_ragged_tail_and_degenerate_docs(spark):
    rows = [
        (0, ""),          # split('') = [''] -> one empty paragraph
        (1, "solo"),      # single word, single short paragraph
        (2, ""),          # duplicate empty paragraph -> emptied
        (3, "solo x"),    # 'solo x' differs from 'solo': kept whole
    ]
    got = _run(_docs(spark, rows))
    assert got[0] == (1, 1, "")
    assert got[1] == (1, 1, "solo")
    assert got[2] == (1, 0, "")
    assert got[3] == (1, 1, "solo x")


def test_first_occurrence_is_min_doc_then_pid(spark):
    # The shared paragraph S appears at pid 1 in doc 5 and pid 0 in
    # doc 9: (5, 1) < (9, 0), so doc 5 keeps it and doc 9 drops it.
    S = _words("s", 3)
    U5, U9 = _words("u", 3), _words("v", 3)
    got = _run(_docs(spark, [(5, f"{U5} {S}"), (9, f"{S} {U9}")]))
    assert got[5] == (2, 2, f"{U5} {S}")
    assert got[9] == (2, 1, U9)


def test_partition_invariance(spark):
    rows = [(i, _words(f"p{i % 4}", 9)) for i in range(40)]
    one = _run(_docs(spark, rows).coalesce(1))
    many = _run(_docs(spark, rows).repartition(13))
    assert one == many


def test_plan_has_no_window_node(spark):
    df = _docs(spark, [(0, "a b c"), (1, "a b c")])
    plan = paragraph_dedup(df, words_per_para=3)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "election must be groupBy argmin, not a window"


def test_plan_evaluates_split_exactly_once(spark):
    """Perf pin for the two measured optimizer traps (50k docs,
    local[8]: 26.7s -> 1.5s): (1) split() must stay a standalone
    projection referenced by the transform lambda — inlined, it
    re-evaluates per paragraph; (2) the generator must be the OUTER
    posexplode — the non-outer form makes InferFiltersFromGenerate
    push a filter that inlines the whole segmentation below the
    projection.  Both regressions show up as split( inlined inside the
    transform lambda (next to slice() on the same plan line) or inside
    a Filter node; the healthy plan keeps every split( in a standalone
    `Project [... split(...) AS words]` (one per DAG fork — the stats
    branch and the paras branch each scan once)."""
    df = _docs(spark, [(0, "a b c d e f"), (1, "g h i")])
    plan = (
        paragraph_dedup(df, words_per_para=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_split = 0
    for line in plan.splitlines():
        if "split(" in line:
            n_split += 1
            assert "slice(" not in line, "split inlined into the lambda"
            assert "Filter" not in line, "split inlined into an inferred filter"
            assert "AS words" in line, "split must feed the words projection"
    assert n_split == 2  # one hoisted projection per DAG fork
    # trap 3: min(struct) would compile the election to a SortAggregate
    # that sorts the full paragraph corpus on both sides of the
    # exchange; the decimal(38) ordering key keeps it a HashAggregate
    # (2M docs, local[8]: 54.2s -> 38.0s, identical results)
    assert "SortAggregate" not in plan


def test_words_per_para_validated(spark):
    with pytest.raises(ValueError):
        paragraph_dedup(_docs(spark, [(0, "a")]), words_per_para=0)
