"""The batched minhash kernel must be bit-identical to the per-doc one.

_batch_minhash_matrix replaces the r4 per-doc signature loop; the two
paths share no code beyond the permutation constants, so this identity
test is the guard that the global-rolling-hash + gather + reduceat
vectorization cannot change a single signature value (the same
discipline as _band_keys' vectorization note in dedup.py)."""

import numpy as np
import pytest

from sequali_spark.operators.dedup import (
    _batch_minhash_matrix,
    _minhash_signature,
)

EDGE_TEXTS = [
    "",                       # empty -> padded to k NULs
    "a",                      # shorter than k
    "abcd",                   # exactly k-1
    "abcde",                  # exactly k (one shingle)
    "ab\x00cd\x00ef",         # embedded NULs (must not conflate with pad)
    "aaaaaaaaaa",             # degenerate repeat
    "héllo wörld — ünïcode ß £ 漢字テスト",  # multi-byte utf-8
    "the quick brown fox jumps over the lazy dog " * 40,  # long
]


def test_batch_matches_per_doc_on_edges():
    got = _batch_minhash_matrix(EDGE_TEXTS)
    want = np.stack([_minhash_signature(t) for t in EDGE_TEXTS])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("tile", [1, 7, 64, 1024, 8192])
def test_batch_matches_per_doc_random_any_tile(tile):
    # random printable + occasional multi-byte; doc lengths straddle the
    # tile boundary so groups of 1 doc and many docs both occur
    rng = np.random.RandomState(7)
    alphabet = list("abcdefgh ijklmnop\n\t.,!?") + ["é", "漢"]
    texts = [
        "".join(rng.choice(alphabet, size=rng.randint(0, 400)))
        for _ in range(60)
    ]
    got = _batch_minhash_matrix(texts, tile=tile)
    want = np.stack([_minhash_signature(t) for t in texts])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("byte_budget", [1, 100, 1000, 4 << 20])
def test_batch_matches_per_doc_any_byte_budget(byte_budget):
    # the transient-memory chunking (sub-batches of <= byte_budget
    # encoded bytes) must never change a signature — budgets below a
    # single doc's size force one-doc chunks
    rng = np.random.RandomState(11)
    alphabet = list("abcdefgh ijklmnop")
    texts = [
        "".join(rng.choice(alphabet, size=rng.randint(0, 300)))
        for _ in range(40)
    ]
    got = _batch_minhash_matrix(texts, byte_budget=byte_budget)
    want = np.stack([_minhash_signature(t) for t in texts])
    np.testing.assert_array_equal(got, want)


def test_batch_empty_input():
    assert _batch_minhash_matrix([]).shape == (0, 64)
