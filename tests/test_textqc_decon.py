"""Winnow-path decontamination: the large-probe-set equi-join wrapper
must return EXACTLY the broadcast theta-join's hits on the same input
(dual-path identity, the same discipline as IVF's full-probe == brute
test), and reject probes too short for the winnowing guarantee."""

import pytest
from pyspark.sql import functions as F

from sequali_spark.functions.kernels import WINNOW_K, WINNOW_W
from sequali_spark.operators.textqc import (
    decontamination_hits,
    decontamination_hits_winnow,
)

MIN_LEN = WINNOW_W + WINNOW_K - 1  # 23


@pytest.fixture(scope="module")
def decon_fixture(spark):
    probe_a = "the quick brown fox jumps over the lazy dog tonight"
    probe_b = "colorless green ideas sleep furiously in the corpus"
    probe_c = "this probe matches no document at all, ever, anywhere"
    filler = "ordinary web page content about routers and recipes. "
    docs = spark.createDataFrame(
        [
            # probe at the very start
            (0, probe_a + " " + filler * 5, "s1", 300),
            # probe buried mid-document (position robustness)
            (1, filler * 3 + probe_b + " " + filler * 3, "s1", 400),
            # TWO probes in one doc
            (2, filler + probe_a + filler + probe_b, "s2", 300),
            # clean docs
            (3, filler * 6, "s2", 320),
            (4, "", "s2", 0),
        ],
        schema="doc_id long, text string, source string, n_chars long",
    )
    probes = spark.createDataFrame(
        [(900, probe_a), (901, probe_b), (902, probe_c)],
        schema="probe_doc long, probe string",
    )
    return docs, probes


def test_winnow_path_equals_broadcast_path(spark, decon_fixture):
    docs, probes = decon_fixture
    broadcast = {
        (r["doc_id"], r["probe_doc"])
        for r in decontamination_hits(docs, probes=probes).collect()
    }
    winnow = {
        (r["doc_id"], r["probe_doc"])
        for r in decontamination_hits_winnow(docs, probes).collect()
    }
    assert broadcast == winnow
    assert broadcast == {(0, 900), (1, 901), (2, 900), (2, 901)}


def test_winnow_path_emits_probe_column(spark, decon_fixture):
    docs, probes = decon_fixture
    row = (
        decontamination_hits_winnow(docs, probes)
        .filter(F.col("doc_id") == 0)
        .first()
    )
    assert row["probe"].startswith("the quick brown fox")


def test_winnow_equivalence_randomized_midscale(spark):
    """Randomized dual-path equivalence at a less toy scale: 400 docs,
    80 probes (some planted verbatim at random positions, some absent,
    some duplicated across docs), winnow == broadcast exactly."""
    import numpy as np

    rng = np.random.RandomState(17)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]

    def sentence(n):
        return " ".join(rng.choice(words, size=n))

    probes = [f"probe {i:03d} " + sentence(4) for i in range(80)]  # >= 23 chars
    docs = []
    for d in range(400):
        body = sentence(rng.randint(20, 60))
        # plant 0-2 probes at random word boundaries
        for p in rng.choice(80, size=rng.randint(0, 3), replace=False):
            cut = rng.randint(0, len(body))
            body = body[:cut] + " " + probes[p] + " " + body[cut:]
        docs.append((d, body, "s", len(body)))
    docs_df = spark.createDataFrame(
        docs, schema="doc_id long, text string, source string, n_chars long"
    )
    probes_df = spark.createDataFrame(
        [(900 + i, p) for i, p in enumerate(probes)],
        schema="probe_doc long, probe string",
    )
    broadcast = {
        (r["doc_id"], r["probe_doc"])
        for r in decontamination_hits(docs_df, probes=probes_df).collect()
    }
    winnow = {
        (r["doc_id"], r["probe_doc"])
        for r in decontamination_hits_winnow(docs_df, probes_df).collect()
    }
    assert broadcast == winnow
    assert len(broadcast) > 100  # the fixture actually planted hits


def test_winnow_rejects_short_probes(spark, decon_fixture):
    docs, _ = decon_fixture
    short = spark.createDataFrame(
        [(900, "x" * (MIN_LEN - 1))], schema="probe_doc long, probe string"
    )
    with pytest.raises(ValueError, match="winnowing"):
        decontamination_hits_winnow(docs, short)


def test_broadcast_guard_points_at_winnow_wrapper(spark, decon_fixture):
    docs, probes = decon_fixture
    with pytest.raises(ValueError, match="decontamination_hits_winnow"):
        decontamination_hits(docs, probes=probes, max_broadcast_probes=2)
