"""Hashed character-n-gram language identifier (fastText-style, from scratch).

Plays the role of sequali's sequencing-technology detection
(reference: src/sequali/util.py:162-254 — classify a record by the shape
of its header) generalized to a linear classifier over hashed char
trigrams, the standard fastText/langid.py architecture re-implemented
from public knowledge only.

The model is *derived deterministically at import time* from the seeded
fixture vocabularies (sequali_spark.fixtures.LANG_VOCAB) — the analogue
of sequali shipping its contaminant FASTA databases in-package.  No
network, no external artifacts; identical weights in every process, so
the oracle and every Spark executor score identically.
"""

from __future__ import annotations

import numpy as np

HASH_DIM = 4096
NGRAM_N = 3
_PRIME = np.uint64(1099511628211)
_BASIS = np.uint64(14695981039346656037)


def _ngram_hashes(text: str, n: int = NGRAM_N, dim: int = HASH_DIM) -> np.ndarray:
    """FNV-1a over byte n-grams of the (lowercased, space-padded) text."""
    b = (" " + text.lower() + " ").encode("utf-8")
    if len(b) < n:
        return np.zeros(0, dtype=np.int64)
    a = np.frombuffer(b, dtype=np.uint8)
    with np.errstate(over="ignore"):
        h = np.full(len(a) - n + 1, _BASIS, dtype=np.uint64)
        for k in range(n):
            h = (h ^ a[k : len(a) - n + 1 + k].astype(np.uint64)) * _PRIME
    return (h % np.uint64(dim)).astype(np.int64)


def _profile(texts: list[str], dim: int = HASH_DIM) -> np.ndarray:
    counts = np.ones(dim, dtype=np.float64)  # add-one smoothing
    for t in texts:
        idx = _ngram_hashes(t, dim=dim)
        if len(idx):
            np.add.at(counts, idx, 1.0)
    return np.log(counts / counts.sum())


class LangIdModel:
    """log-probability profile per language; score = mean log-prob of the
    document's hashed trigrams under each profile (multinomial NB)."""

    def __init__(self, lang_texts: dict[str, list[str]]):
        self.langs = sorted(lang_texts)
        self.weights = np.stack([_profile(lang_texts[lang]) for lang in self.langs])

    def predict(self, texts: list[str], max_chars: int = 400) -> tuple[np.ndarray, np.ndarray]:
        """Returns (lang_codes: object array, confidence: float array).

        Confidence is the softmax margin of the best language. Documents
        with no trigrams get lang='und', confidence 0 — the analogue of
        sequali's skipped_reason soft-degrade (_qcmodule.c:3136-3148).
        """
        n = len(texts)
        preds = np.full(n, "und", dtype=object)
        conf = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(texts):
            idx = _ngram_hashes(t[:max_chars])
            if len(idx) == 0:
                continue
            counts = np.bincount(idx, minlength=HASH_DIM).astype(np.float64)
            scores = self.weights @ counts / len(idx)
            order = np.argsort(scores)
            best = order[-1]
            # softmax over per-ngram mean log-probs, temperature-free margin
            e = np.exp(scores - scores[best])
            preds[i] = self.langs[best]
            conf[i] = float(1.0 / e.sum())
        return preds, conf


_MODEL: LangIdModel | None = None


def get_model() -> LangIdModel:
    """Module-level singleton built from the seeded fixture vocabularies."""
    global _MODEL
    if _MODEL is None:
        from sequali_spark.fixtures import lang_training_texts

        _MODEL = LangIdModel(lang_training_texts())
    return _MODEL
