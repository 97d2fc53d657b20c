"""KenLM-style per-language character n-gram LM for perplexity scoring.

Hashed trigram counts with bigram-context backoff denominator and add-alpha
smoothing:  P(c | c-2 c-1) = (C3[h3] + a) / (C2[h2] + a*V).
Perplexity = exp(-mean log P). Trained deterministically from the seeded
generators (disjoint seed space from datagen and langid). Per-language keep
bands are frozen at train time from held-out clean-text perplexities.

Ancestry: the reference's pluggable detection strategy
(/root/reference/src/datasmith/detection/detect_breakpoints.py:76-83) — a
frozen scoring function applied per group/row, here per transcript.
"""

from __future__ import annotations

import functools

import numpy as np

from .langid import _P1, _P2, _P3, _codepoints
from .text import LANGS, gen_sentence

N_BUCKETS = 1 << 16
_ALPHA = 0.1
_VOCAB = 64.0
_TRAIN_SENTENCES = 400
_TRAIN_WORDS = 60
_HELDOUT_SENTENCES = 200
_BAND_LO_FACTOR = 0.35  # lo = min(heldout) * factor  (repetitive text => tiny ppl)
_BAND_HI_FACTOR = 2.50  # hi = max(heldout) * factor  (gibberish => huge ppl)

_B = np.uint64(N_BUCKETS)
_SEG0 = np.array([0], dtype=np.int64)  # single-segment reduceat starts


def _tri_bi_hashes(text: str) -> tuple[np.ndarray, np.ndarray]:
    """(trigram bucket ids, matching bigram-context bucket ids)."""
    c = _codepoints("  " + text + " ")
    h3 = c[:-2] * _P1 + c[1:-1] * _P2 + c[2:] * _P3
    h2 = c[:-2] * _P1 + c[1:-1] * _P2
    for h in (h3, h2):
        h ^= h >> np.uint64(31)
        h *= _P2
    return (h3 % _B).astype(np.int64), (h2 % _B).astype(np.int64)


class PerplexityModel:
    def __init__(self, tri: np.ndarray, bi: np.ndarray, bands: dict[str, tuple[float, float]]):
        self.tri = tri    # (L, N_BUCKETS) float64 trigram counts
        self.bi = bi      # (L, N_BUCKETS) float64 bigram-context counts
        self.bands = bands
        self.lang_index = {lang: i for i, lang in enumerate(LANGS)}

    def ppl_one(self, text: str | None, lang: str | None) -> float:
        """Perplexity of `text` under the `lang` LM (inf if unscorable).

        The log-prob sum order is CANONICALLY np.add.reduceat (verified
        position-independent), so ppl_batch — which reduces all row segments
        of one concatenated gather — is bit-identical to this per-row oracle
        path (tests/test_text_models.py).
        """
        if not text or not text.strip() or lang not in self.lang_index:
            return float("inf")
        li = self.lang_index[lang]
        h3, h2 = _tri_bi_hashes(text.lower())
        p = (self.tri[li, h3] + _ALPHA) / (self.bi[li, h2] + _ALPHA * _VOCAB)
        lp = np.log(p)
        total = np.add.reduceat(lp, _SEG0)[0]
        return float(np.exp(-(total / lp.size)))

    def ppl_batch(self, texts, langs) -> np.ndarray:
        """Vectorized ppl_one over a batch: one fancy-index gather over
        (lang, trigram) pairs + one segmented np.add.reduceat — the same
        canonical reduction order ppl_one uses, so results are bit-identical
        (tests/test_text_models.py). Unscorable rows get inf."""
        n = len(texts)
        out = np.full(n, np.inf, dtype=np.float64)
        live: list[int] = []
        tri_h: list[np.ndarray] = []
        bi_h: list[np.ndarray] = []
        lis: list[int] = []
        for i in range(n):
            t, lg = texts[i], langs[i]
            if t is None or not isinstance(t, str) or not t or not t.strip():
                continue
            if lg not in self.lang_index:
                continue
            h3, h2 = _tri_bi_hashes(t.lower())
            live.append(i)
            tri_h.append(h3)
            bi_h.append(h2)
            lis.append(self.lang_index[lg])
        if not live:
            return out
        lens = np.array([h.size for h in tri_h], dtype=np.int64)
        li_rep = np.repeat(np.array(lis, dtype=np.int64), lens)
        all_h3 = np.concatenate(tri_h)
        all_h2 = np.concatenate(bi_h)
        p = (self.tri[li_rep, all_h3] + _ALPHA) / (self.bi[li_rep, all_h2] + _ALPHA * _VOCAB)
        lp = np.log(p)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        sums = np.add.reduceat(lp, starts)
        out[np.array(live, dtype=np.int64)] = np.exp(-(sums / lens))
        return out

    def in_band(self, ppl: float, lang: str | None) -> bool:
        if lang not in self.bands or not np.isfinite(ppl):
            return False
        lo, hi = self.bands[lang]
        return lo <= ppl <= hi


@functools.lru_cache(maxsize=1)
def model() -> PerplexityModel:
    tri = np.zeros((len(LANGS), N_BUCKETS), dtype=np.float64)
    bi = np.zeros((len(LANGS), N_BUCKETS), dtype=np.float64)
    for li, lang in enumerate(LANGS):
        rng = np.random.default_rng([7, 2002, li])
        for _ in range(_TRAIN_SENTENCES):
            h3, h2 = _tri_bi_hashes(gen_sentence(rng, lang, _TRAIN_WORDS).lower())
            np.add.at(tri[li], h3, 1.0)
            np.add.at(bi[li], h2, 1.0)
    m = PerplexityModel(tri, bi, {})
    # freeze per-language keep bands from held-out clean text
    for li, lang in enumerate(LANGS):
        rng = np.random.default_rng([7, 3003, li])
        ppls = np.array([
            m.ppl_one(gen_sentence(rng, lang, max(5, _TRAIN_WORDS // 3)), lang)
            for _ in range(_HELDOUT_SENTENCES)
        ])
        m.bands[lang] = (float(ppls.min() * _BAND_LO_FACTOR), float(ppls.max() * _BAND_HI_FACTOR))
    return m
