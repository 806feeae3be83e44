"""Ring-topology scale guards (ADVICE r4): hot-bucket splitting must
keep degenerate buckets off a single task WITHOUT fragmenting clusters,
sub-cap buckets must be untouched by the salt, and k>1 successors must
add (linear) connectivity edges."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sequali_spark.operators.dedup import (
    connected_components,
    minhash_pairs_for,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_degenerate_mega_bucket_stays_connected(spark):
    # 600 byte-identical docs with collapse_exact=False: every band
    # bucket holds all 600 (the ADVICE skew case). ring_cap=64 splits
    # each band bucket into ~10 salted chains; the 16 bands salt
    # independently, so connected components must still recover ONE
    # cluster — split, not dropped.
    docs = _docs(spark, ["boilerplate footer text, identical everywhere"] * 600)
    pairs = minhash_pairs_for(
        docs, threshold=0.9, edge_mode="ring", ring_cap=64
    )
    comp = connected_components(pairs).toPandas()
    assert set(comp["doc_id"]) == set(range(600))
    assert comp["component"].nunique() == 1


def _planted_corpus(n=80, seed=3):
    rng = np.random.RandomState(seed)
    words = ["alpha", "beta", "gamma", "delta", "web", "page", "corpus", "data"]
    base = [" ".join(rng.choice(words, size=60)) for _ in range(n)]
    # plant near-dups: doc i+n is doc i with a tiny edit
    return base + [t + " tail" for t in base[: n // 2]]


def test_sub_cap_buckets_identical_to_unsalted_ring(spark):
    # every bucket far below the cap -> n_sub == 1 -> salt 0 for every
    # row: the guarded ring must emit exactly the same verified pairs
    # as an effectively-unsalted ring (huge cap)
    docs = _docs(spark, _planted_corpus())
    a = minhash_pairs_for(docs, threshold=0.6, edge_mode="ring", ring_cap=4096)
    b = minhash_pairs_for(docs, threshold=0.6, edge_mode="ring", ring_cap=1 << 40)
    pa = set(map(tuple, a.select("doc_a", "doc_b").toPandas().to_numpy()))
    pb = set(map(tuple, b.select("doc_a", "doc_b").toPandas().to_numpy()))
    assert pa == pb and len(pa) > 0


def test_ring_successors_adds_linear_edges(spark):
    docs = _docs(spark, _planted_corpus())
    k1 = minhash_pairs_for(docs, threshold=0.6, edge_mode="ring").count()
    k2 = minhash_pairs_for(
        docs, threshold=0.6, edge_mode="ring", ring_successors=2
    ).count()
    assert k2 >= k1 > 0


def test_bad_edge_mode_raises(spark):
    docs = _docs(spark, ["abcdef"] * 4)
    with pytest.raises(ValueError):
        minhash_pairs_for(docs, edge_mode="star")
