"""Hashed n-gram language model for perplexity scoring.

The analogue of sequali's per-read mean-quality score: sequali converts
phred chars to error rates through a generated lookup table and averages
in probability space (reference: src/sequali/_qcmodule.c:2126-2137,
score_to_error_rate.h); we convert tokens to log-probabilities through a
hashed count table and average in log space.  KenLM-style interpolated
unigram/bigram model with add-k smoothing, built from scratch.

Deterministic: counts come from the seeded fixture corpus at import
time (no network, no external artifacts), so every executor and the
oracle score identically.
"""

from __future__ import annotations

import numpy as np

from sequali_spark.functions.kernels import stable_hash64, tokenize

LM_DIM = 1 << 16
ADD_K = 0.1
LAMBDA_BIGRAM = 0.7  # interpolation weight: p = λ·p(w|prev) + (1-λ)·p(w)
MAX_TOKENS = 512  # score at most the first N tokens (bounded work per doc)


def _tok_hash(tok: str) -> int:
    return stable_hash64(tok.encode("utf-8"), seed=7) % LM_DIM


def _bigram_hash(prev: str, tok: str) -> int:
    return stable_hash64((prev + "\x1f" + tok).encode("utf-8"), seed=11) % LM_DIM


class NgramLM:
    def __init__(self, texts: list[str]):
        uni = np.zeros(LM_DIM, dtype=np.float64)
        bi = np.zeros(LM_DIM, dtype=np.float64)
        total = 0
        for t in texts:
            toks = tokenize(t)
            total += len(toks)
            for i, w in enumerate(toks):
                uni[_tok_hash(w)] += 1.0
                if i:
                    bi[_bigram_hash(toks[i - 1], w)] += 1.0
        self.uni = uni
        self.bi = bi
        self.total = max(total, 1)

    def _p_uni(self, h: int) -> float:
        return (self.uni[h] + ADD_K) / (self.total + ADD_K * LM_DIM)

    def perplexity(self, text: str) -> float:
        """exp(mean negative log prob) over interpolated bigram/unigram.

        Empty docs score the vocabulary-uniform perplexity (soft-degrade,
        never a failure — cf. sequali's skipped_reason pattern)."""
        toks = tokenize(text)[:MAX_TOKENS]
        if not toks:
            return float(self.total + ADD_K * LM_DIM) / ADD_K
        log_sum = 0.0
        prev = None
        for w in toks:
            hu = _tok_hash(w)
            pu = self._p_uni(hu)
            if prev is None:
                p = pu
            else:
                hb = _bigram_hash(prev, w)
                denom = self.uni[_tok_hash(prev)] + ADD_K * LM_DIM
                pb = (self.bi[hb] + ADD_K) / denom
                p = LAMBDA_BIGRAM * pb + (1.0 - LAMBDA_BIGRAM) * pu
            log_sum += np.log(p)
            prev = w
        return float(np.exp(-log_sum / len(toks)))

    def perplexities(self, texts: list[str]) -> np.ndarray:
        return np.fromiter(
            (self.perplexity(t) for t in texts), dtype=np.float64, count=len(texts)
        )


_MODEL: NgramLM | None = None


def get_model() -> NgramLM:
    global _MODEL
    if _MODEL is None:
        from sequali_spark.fixtures import lm_training_texts

        _MODEL = NgramLM(lm_training_texts())
    return _MODEL
