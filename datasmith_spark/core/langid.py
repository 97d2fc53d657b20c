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

_SEG0 = np.array([0], dtype=np.int64)  # single-segment reduceat starts


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
    """Multinomial NB over hashed char n-grams (linear scorer + softmax).

    Score summation order is CANONICALLY np.add.reduceat over the text's
    hash gather (verified position-independent): predict_one reduces its own
    single segment, predict_batch reduces all row segments of one
    concatenated gather in one call — same values, same reduction order, so
    the per-row oracle path and the Arrow-batched Spark path are
    bit-identical by construction (tests/test_text_models.py).
    """

    def __init__(self, logprob: np.ndarray, langs: tuple[str, ...]):
        self.logprob = logprob  # shape (L, N_BUCKETS), float64
        self.logprob_t = np.ascontiguousarray(logprob.T)  # (N_BUCKETS, L)
        self.langs = langs

    def predict_one(self, text: str | None) -> tuple[str | None, float]:
        if not text or not text.strip():
            return None, 0.0
        idx = ngram_hashes(text)
        scores = np.add.reduceat(self.logprob_t[idx], _SEG0, axis=0)[0]  # (L,)
        m = scores.max()
        p = np.exp(scores - m)
        p /= p.sum()
        best = int(np.argmax(scores))
        return self.langs[best], float(p[best])

    def predict_batch(self, texts) -> tuple[list, list]:
        """Vectorized predict_one over a batch: ONE logprob gather + ONE
        segmented reduction for all rows. Returns (langs, probs) lists
        (None / 0.0 for blank rows, matching predict_one)."""
        n = len(texts)
        langs: list = [None] * n
        probs: list = [None] * n
        live: list[int] = []
        hashes: list[np.ndarray] = []
        for i, t in enumerate(texts):
            if t is None or not isinstance(t, str) or not t or not t.strip():
                probs[i] = 0.0
                continue
            live.append(i)
            hashes.append(ngram_hashes(t))
        if not live:
            return langs, probs
        lens = np.array([h.size for h in hashes], dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        gathered = self.logprob_t[np.concatenate(hashes)]  # (total, L)
        scores = np.add.reduceat(gathered, starts, axis=0)  # (m, L)
        mx = scores.max(axis=1, keepdims=True)
        p = np.exp(scores - mx)
        p /= p.sum(axis=1, keepdims=True)
        best = np.argmax(scores, axis=1)
        for j, i in enumerate(live):
            langs[i] = self.langs[int(best[j])]
            probs[i] = float(p[j, best[j]])
        return langs, probs


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
