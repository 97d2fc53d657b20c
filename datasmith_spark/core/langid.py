"""fastText-style language ID: hashed char n-gram (1-3) linear model.

Trained deterministically at first use from the SAME seeded per-language
generators datagen uses (seed space disjoint from datagen's row seeds), so
the model is a frozen pure function of the code — no external artifacts.
Both the Spark pandas UDF and the oracle call ``model().predict_one``;
decisions are identical by construction.

Ancestry: the reference's stateful per-worker encoder pattern
(tiktoken in /root/reference/src/datasmith/scrape/build_reports.py:235-246 —
model initialized once, applied per row) re-expressed as an Arrow-batched
scoring kernel.
"""

from __future__ import annotations

import functools

import numpy as np

from .text import LANGS, gen_sentence

N_BUCKETS = 1 << 15
_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_ORDER_SALT = np.uint64(0x27D4EB2F165667C5)

_TRAIN_SENTENCES = 400
_TRAIN_WORDS = 60
_SMOOTH = 1.0


def _codepoints(text: str) -> np.ndarray:
    """Lowercased codepoints as uint64 (utf-32 view; BMP-safe, deterministic)."""
    b = text.lower().encode("utf-32-le")
    return np.frombuffer(b, dtype="<u4").astype(np.uint64)


def ngram_hashes(text: str) -> np.ndarray:
    """All 1/2/3-gram bucket ids of `text` (order-salted into one space)."""
    c = _codepoints(" " + text + " ")
    if c.size == 0:
        return np.empty(0, dtype=np.int64)
    parts = [c * _P1]
    if c.size >= 2:
        parts.append(c[:-1] * _P1 + c[1:] * _P2 + _ORDER_SALT)
    if c.size >= 3:
        parts.append(c[:-2] * _P1 + c[1:-1] * _P2 + c[2:] * _P3 + _ORDER_SALT * np.uint64(2))
    h = np.concatenate(parts)
    h ^= h >> np.uint64(29)
    h *= _P2
    h ^= h >> np.uint64(32)
    return (h % np.uint64(N_BUCKETS)).astype(np.int64)


class LangIdModel:
    """Multinomial NB over hashed char n-grams (linear scorer + softmax)."""

    def __init__(self, logprob: np.ndarray, langs: tuple[str, ...]):
        self.logprob = logprob  # shape (L, N_BUCKETS), float64
        self.langs = langs

    def predict_one(self, text: str | None) -> tuple[str | None, float]:
        if not text or not text.strip():
            return None, 0.0
        idx = ngram_hashes(text)
        scores = self.logprob[:, idx].sum(axis=1)  # (L,)
        m = scores.max()
        p = np.exp(scores - m)
        p /= p.sum()
        best = int(np.argmax(scores))
        return self.langs[best], float(p[best])


@functools.lru_cache(maxsize=1)
def model() -> LangIdModel:
    """Build (once per process) the frozen model from seeded generators."""
    counts = np.full((len(LANGS), N_BUCKETS), _SMOOTH, dtype=np.float64)
    for li, lang in enumerate(LANGS):
        rng = np.random.default_rng([7, 1001, li])
        for _ in range(_TRAIN_SENTENCES):
            idx = ngram_hashes(gen_sentence(rng, lang, _TRAIN_WORDS))
            np.add.at(counts[li], idx, 1.0)
    logprob = np.log(counts / counts.sum(axis=1, keepdims=True))
    return LangIdModel(logprob, LANGS)
