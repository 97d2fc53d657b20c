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


# --- code-switching detection (q165) ----------------------------------------

CS_WIN_WORDS = 8  # langid vote window (words)
CS_HOP_WORDS = 4
CS_MIN_WINDOWS = 2  # below this the transcript is too short to call mixed
CS_SECONDARY_Q = 4  # mixed iff secondary windows >= n_windows / 4


def codeswitch_stats(text: str | None) -> dict:
    """Segment-level language-ID voting over a transcript: slide a
    CS_WIN_WORDS-word window (hop CS_HOP_WORDS) and classify each window
    with the frozen langid model, then report the majority language, the
    strongest minority language, and the integer mixed verdict
    (CS_SECONDARY_Q * n_secondary >= n_windows with at least
    CS_MIN_WINDOWS windows) — the code-switching / wrong-langid-confidence
    signal a monolingual whole-document classifier (the pipeline's langid
    stage) cannot express. Ties break by (count desc, lang asc) so every
    output is deterministic.

    Transcripts shorter than one full window get a single all-words
    window; blank/None yields n_windows = 0 and null languages.
    """
    if text is None or not str(text).strip():
        return {
            "n_windows": 0, "lang_primary": None, "n_primary": 0,
            "lang_secondary": None, "n_secondary": 0, "mixed": False,
        }
    words = str(text).split()
    if len(words) >= CS_WIN_WORDS:
        spans = [
            words[s : s + CS_WIN_WORDS]
            for s in range(0, len(words) - CS_WIN_WORDS + 1, CS_HOP_WORDS)
        ]
    else:
        spans = [words]
    m = model()
    votes: dict[str, int] = {}
    for w in spans:
        lang, _ = m.predict_one(" ".join(w))
        if lang is not None:
            votes[lang] = votes.get(lang, 0) + 1
    if not votes:
        return {
            "n_windows": 0, "lang_primary": None, "n_primary": 0,
            "lang_secondary": None, "n_secondary": 0, "mixed": False,
        }
    ranked = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))
    n_windows = sum(votes.values())
    lang_p, n_p = ranked[0]
    lang_s, n_s = ranked[1] if len(ranked) > 1 else (None, 0)
    mixed = n_windows >= CS_MIN_WINDOWS and CS_SECONDARY_Q * n_s >= n_windows
    return {
        "n_windows": n_windows, "lang_primary": lang_p, "n_primary": n_p,
        "lang_secondary": lang_s, "n_secondary": n_s, "mixed": mixed,
    }


def mixed_variant(text: str, clip_id: str) -> str:
    """Deterministic planted CODE-SWITCHED transcript: the original text
    followed by an equal-length sentence in a DIFFERENT language, chosen by
    id hash (next language in LANGS if the hash pick equals the model's
    whole-text prediction). Ground truth for q165 — the text-lane analogue
    of the audio planting lanes (delayed/noisy/speed variants)."""
    import zlib

    from .text import gen_sentence

    base_lang, _ = model().predict_one(text)
    h = zlib.crc32((clip_id + "#mix").encode())
    pick = LANGS[h % len(LANGS)]
    if pick == base_lang:
        pick = LANGS[(h + 1) % len(LANGS)]
    n_words = max(len(str(text).split()), CS_WIN_WORDS)
    rng = np.random.default_rng([int(h), 4242])
    return str(text) + " " + gen_sentence(rng, pick, n_words)
