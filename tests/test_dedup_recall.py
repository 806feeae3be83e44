"""Near-dup recall on the pages fixture: the generator plants exact and
±1-word duplicates (FIXTURES.md class 'dup'); MinHash-LSH must find
them — the functional gate for the dedup family, analogous to sequali's
fingerprinter cross-check (reference: scripts/fingerprinter.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequali_spark.operators import dedup
from tests.test_pipeline import pages_df


@pytest.fixture(scope="module")
def truth_pairs(pages_small):
    """(url_a, url_b) ground-truth duplicate pairs from the generator:
    dup-class docs share (or nearly share) text with a clean doc."""
    by_exact = {}
    pairs = set()
    texts = pages_small["text"].tolist()
    urls = pages_small["url"].tolist()
    cls = pages_small["cls"].tolist()
    for i, t in enumerate(texts):
        if cls[i] in ("clean_en", "dup") and t:
            if t in by_exact:
                a, b = sorted([urls[by_exact[t]], urls[i]])
                pairs.add((a, b, "exact"))
            else:
                by_exact[t] = i
    return pairs


def test_minhash_recall_on_pages(spark, pages_small, truth_pairs):
    exact_truth = {(a, b) for a, b, kind in truth_pairs if kind == "exact"}
    assert len(exact_truth) >= 10, "fixture should plant exact dups"

    pages = pages_df(spark, pages_small)
    found = dedup.minhash_pairs_for(
        pages, id_col="url", text_col="text", threshold=0.8
    ).collect()
    found_pairs = {(r["doc_a"], r["doc_b"]) for r in found}

    hit = exact_truth & found_pairs
    recall = len(hit) / len(exact_truth)
    assert recall >= 0.95, f"exact-dup recall {recall:.2f}"

    # estimated jaccard for exact dups must be 1.0
    exact_found = [r for r in found if (r["doc_a"], r["doc_b"]) in exact_truth]
    assert all(r["est_jaccard"] == 1.0 for r in exact_found)


def test_minhash_finds_near_dups(spark, pages_small):
    """±1-word near-dups (same text with one word replaced) sit well
    above the 0.8 estimated-Jaccard threshold for long docs."""
    cls = pages_small["cls"].to_numpy()
    near_urls = set(pages_small["url"][cls == "dup"])
    pages = pages_df(spark, pages_small)
    found = dedup.minhash_pairs_for(pages, id_col="url", text_col="text", threshold=0.8)
    touched = (
        found.select(F.explode(F.array("doc_a", "doc_b")).alias("url")).distinct().collect()
    )
    touched_urls = {r["url"] for r in touched}
    # most dup-class docs participate in at least one found pair
    frac = len(near_urls & touched_urls) / max(len(near_urls), 1)
    assert frac >= 0.8, f"near-dup participation {frac:.2f}"


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """IVF with n_probe == n_centroids is exhaustive: result must equal
    brute force exactly (structural correctness, data-independent)."""
    from sequali_spark.operators import similarity

    bf = similarity.brute_force_topk(spark, sf_dir, n_queries=5, k=5).collect()
    ivf = similarity.ivf_topk(
        spark, sf_dir, n_queries=5, k=5, n_centroids=8, n_probe=8
    ).collect()
    assert [tuple(r) for r in bf] == [tuple(r) for r in ivf]


def test_ivf_partial_probe_recall(spark, sf_dir):
    from sequali_spark.operators import similarity

    bf = similarity.brute_force_topk(spark, sf_dir, n_queries=10, k=5).collect()
    ivf = similarity.ivf_topk(
        spark, sf_dir, n_queries=10, k=5, n_centroids=16, n_probe=8
    ).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in bf}
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.3  # random-ish vectors; probing half the lists


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark, sf_dir):
    from sequali_spark.operators import dedup

    pairs_df = dedup.minhash_near_dup_pairs(spark, sf_dir, threshold=0.5).select(
        "doc_a", "doc_b"
    )
    pairs = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    assert pairs, "need candidate pairs for the test to mean anything"
    truth = _union_find(pairs)
    got = {
        r["doc_id"]: r["component"]
        for r in dedup.connected_components(pairs_df).collect()
    }
    assert got == truth


def test_dedup_keepers(spark, sf_dir):
    from sequali_spark.operators import dedup

    rows = dedup.dedup_keepers(spark, sf_dir, threshold=0.8).collect()
    comps = {}
    for r in rows:
        comps.setdefault(r["component"], []).append(r)
    for comp_id, members in comps.items():
        keepers = [m for m in members if m["keep_doc"]]
        assert len(keepers) == 1
        assert keepers[0]["doc_id"] == comp_id == min(m["doc_id"] for m in members)
