"""Generator determinism + oracle invariants (the stage-0 gate of
SURVEY.md §7.3: pytest green on the oracle's own invariants before any
Spark code runs)."""

from __future__ import annotations

import numpy as np

from sequali_spark.fixtures import PAGES_COLUMNS, generate_pages
from sequali_spark.oracle import oracle_metrics, oracle_report


def test_generator_deterministic():
    a = generate_pages(500, seed=42)
    b = generate_pages(500, seed=42)
    assert a["url"].tolist() == b["url"].tolist()
    assert a["text"].tolist() == b["text"].tolist()
    assert (a["warc_ts"] == b["warc_ts"]).all()
    c = generate_pages(500, seed=43)
    assert a["text"].tolist() != c["text"].tolist()


def test_generator_schema_and_classes(pages_small):
    assert list(pages_small.columns) == PAGES_COLUMNS + ["cls"]
    counts = pages_small["cls"].value_counts()
    for cls in ["clean_en", "clean_other", "boilerplate", "dup", "pii", "tox", "junk", "degenerate"]:
        assert counts.get(cls, 0) > 0, cls
    # degenerate rows include an empty text and a giant doc
    assert (pages_small["text"].str.len() == 0).any()
    assert pages_small["text"].str.len().max() > 50_000


def test_oracle_labels_sane(pages_small):
    m = oracle_metrics(pages_small)
    assert len(m) == len(pages_small)
    cls = pages_small["cls"].to_numpy()
    keep = m["keep"].to_numpy()
    # clean english overwhelmingly kept
    assert keep[cls == "clean_en"].mean() > 0.95
    # junk + toxicity overwhelmingly dropped
    assert keep[cls == "junk"].mean() < 0.1
    assert keep[cls == "tox"].mean() == 0.0
    # every tox doc got scrubbed
    assert (m["tox_hits"].to_numpy()[cls == "tox"] > 0).all()
    assert (m["pii_hits"].to_numpy()[cls == "pii"] > 0).all()


def test_oracle_langid_accuracy(pages_small):
    m = oracle_metrics(pages_small)
    cls = pages_small["cls"].to_numpy()
    mask = (cls == "clean_en") | (cls == "clean_other")
    truth = pages_small["lang"].to_numpy()[mask]
    pred = m["lang_pred"].to_numpy()[mask]
    assert (truth == pred).mean() > 0.97


def test_oracle_scrub_byte_exact(pages_small):
    m = oracle_metrics(pages_small)
    cls = pages_small["cls"].to_numpy()
    texts = pages_small["text"].to_numpy()
    scrubbed = m["scrubbed_text"].to_numpy()
    pii = np.flatnonzero(cls == "pii")
    assert len(pii)
    for i in pii:
        s = scrubbed[i].decode("utf-8")
        assert "<EMAIL>" in s or "<PHONE>" in s or "<IP>" in s
        assert "@example" not in s
    clean = np.flatnonzero(cls == "clean_en")
    for i in clean[:50]:  # untouched docs: NULL contract (text unchanged)
        assert scrubbed[i] is None


def test_oracle_report_values(pages_small):
    m = oracle_metrics(pages_small)
    rep = oracle_report(m)
    assert rep["docs_seen"] == len(pages_small)
    assert 0 < rep["docs_kept"] < rep["docs_seen"]
    assert rep["docs_scrubbed"] > 0
    assert rep["rule_hits"]["toxicity"] > 0
    # exact duplicates exist -> some fingerprint seen >= 2 times
    assert any(k >= 2 for k in rep["duplication_hist"])
    assert rep["estimated_unique_fraction"] < 1.0
    # planted boilerplate surfaces as overrepresented shingles
    assert len(rep["overrepresented"]) > 0
    assert any("navigation" in o["shingle"] or "host" in o["shingle"] for o in rep["overrepresented"])


def test_model_artifacts_fresh():
    """The baked .npz artifacts must equal freshly-trained models —
    guards against editing vocab/hash code without rebuilding
    (scripts/build_models.py)."""
    import numpy as np

    from sequali_spark.fixtures import lang_training_texts, lm_training_texts
    from sequali_spark.functions import langid, perplexity

    baked_lang = langid.get_model()
    fresh_lang = langid.LangIdModel(lang_training_texts())
    assert baked_lang.langs == fresh_lang.langs
    assert np.array_equal(baked_lang.weights, fresh_lang.weights)

    baked_lm = perplexity.get_model()
    fresh_lm = perplexity.NgramLM(lm_training_texts())
    assert np.array_equal(baked_lm.uni, fresh_lm.uni)
    assert np.array_equal(baked_lm.bi, fresh_lm.bi)
    assert baked_lm.total == fresh_lm.total
