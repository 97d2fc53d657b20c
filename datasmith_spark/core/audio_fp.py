"""Haitsma-Kalker-style audio fingerprint kernel (pure numpy).

Near-duplicate AUDIO detection for a training-data pipeline: every dedup
family so far (exact md5, MinHash, SimHash, winnowing, embedding-LSH) keys
on the transcript or an embedding; re-uploaded / re-encoded / gain-ridden
copies of the same recording defeat all of them. This kernel fingerprints
the signal itself, following the classic Philips robust-hash construction
(Haitsma & Kalker, "A Highly Robust Audio Fingerprinting System", ISMIR
2002 — public literature): per-frame log band energies, and one bit per
adjacent band pair from the SIGN of the time-and-band energy difference

    bit[n, m] = 1  iff  (E[n,m] - E[n,m+1]) - (E[n-1,m] - E[n-1,m+1]) > 0

Signs of energy differences are exactly invariant to global gain (a gain g
shifts every log energy by the same constant) and highly stable under
re-encoding/requantization (only |ddE| below the quantization noise floor
can flip), which is precisely the robustness audio dedup needs.

Scope note: the q38 lane joins on EXACT k-gram keys, so it catches gain
changes and fine requantization (pcm16/float32 round-trips — measured
key-set Jaccard 0.8-1.0 on planted duplicates) but NOT coarse 8-bit
companding (mu-law/A-law re-encodes flip ~4% of sign bits — too many for 4
consecutive clean frames). Matching those is the ROBUST lane (q40): the
original paper's lookup-table expansion, realized as a radius-1 Hamming
ball over integer 2-gram keys (`fp_int_keys` + a 33-mask XOR explode in
the operator) — measured on the pinned corpus's planted mu-law
round-trips: 0.07-0.83 of a dup's 2-grams land within Hamming distance 1
of the original's, vs <=0.011 for unrelated clips (a 6x class gap at the
weakest plant). Expansion is pure integer XOR, so both
Spark (bitwiseXOR, JVM-side) and the DuckDB oracle (xor()) derive the
ball from the same committed exact keys — no key blowup in the fixture.

Everything is built on the existing portable kernels: `resample` (Lanczos
sinc) normalizes to FP_SR first so fingerprints are comparable across
source sample rates, and `logmel` (fixed-order, BLAS-free summation)
provides the band energies — so fingerprints are bit-identical across
hosts/BLAS builds and the committed oracle fixture is portable (same rule
as core/audio.py rms).

Per-row-only and deterministic: results are invariant to Arrow batch
boundaries and partitioning.

Ancestry: the reference dedups rows via an exact seen-set over scraped keys
(/root/reference/src/datasmith/scrape/code_coverage.py:83-88); this is the
modality-aware analogue its text-only pipeline never needed.

>>> import numpy as np
>>> rng = np.random.default_rng(7)
>>> x = np.sin(2 * np.pi * 440 * np.arange(32000) / 16000.0)
>>> x = 0.5 * x + 0.05 * rng.standard_normal(32000)
>>> fp = fingerprint_bits(x, 16000)
>>> fp.dtype, fp.shape == (1 + (32000 - FP_NFFT) // FP_HOP - 1,)
(dtype('uint16'), True)
>>> bool(np.array_equal(fp, fingerprint_bits(0.25 * x, 16000)))  # gain-invariant
True
>>> keys = fp_keys(x, 16000)
>>> len(keys) == len(set(keys)) and all(len(k) == 4 * FP_KGRAM for k in keys)
True
>>> iks = fp_int_keys(x, 16000)
>>> all(0 <= k < (1 << 32) for k in iks) and iks == sorted(set(iks))
True
>>> y = aug_mulaw_variant(x)  # mu-law re-encode: survives the ball, not exact keys
>>> len(set(fp_int_keys(y, 16000)) & set(iks)) < len(iks) // 2
True
"""

from __future__ import annotations

import numpy as np

from .audio import decode, encode
from .resample import logmel, resample

FP_SR = 16000  # common analysis rate: fingerprints comparable across sources
FP_NFFT = 512
FP_HOP = 256
FP_BANDS = 17  # 17 mel bands -> 16 sign bits per frame (one uint16)
FP_KGRAM = 4  # consecutive sub-fingerprints per LSH key (64 bits of context)
FP_IKGRAM = 2  # robust lane: 2 sub-fps -> one 32-bit integer key (ball-joinable)
FP_MAX_S = 5.0  # fingerprint the clip head only: bounds cost per row
AUG_GAIN = 0.8  # deterministic near-duplicate derivation (tests/oracle)
AUG_MULAW_GAIN = 0.9  # robust-lane planted derivation: gain + mu-law round-trip


def fingerprint_bits(pcm: np.ndarray, sr: int) -> np.ndarray:
    """float PCM at sr -> uint16 sub-fingerprint per frame (may be empty).

    Resamples to FP_SR when needed, then 17-band log-mel at FP_NFFT/FP_HOP
    and the HK sign rule above. Clips yielding < 2 frames return empty.
    """
    x = np.asarray(pcm, dtype=np.float64)
    if sr != FP_SR:
        x = resample(x, sr, FP_SR)
    e = logmel(x, FP_SR, n_fft=FP_NFFT, hop=FP_HOP, n_mels=FP_BANDS)
    if e.shape[0] < 2:
        return np.zeros(0, dtype=np.uint16)
    d = e[:, :-1] - e[:, 1:]  # adjacent-band differences, (n_frames, 16)
    dd = d[1:] - d[:-1]  # time difference of band differences
    bits = dd > 0.0
    out = np.zeros(bits.shape[0], dtype=np.uint16)
    for b in range(FP_BANDS - 1):  # fixed-order bit pack, no BLAS
        out |= bits[:, b].astype(np.uint16) << np.uint16(b)
    return out


def fp_keys(
    pcm: np.ndarray, sr: int, kgram: int = FP_KGRAM, max_s: float = FP_MAX_S
) -> list[str]:
    """Distinct k-gram LSH keys (sorted) for a clip's fingerprint head.

    Each key is kgram consecutive sub-fingerprints hex-packed into one
    string — exact-match joinable in any engine. A single flipped bit kills
    only the kgram keys covering that frame; surviving keys still connect
    the near-duplicate pair (candidate = ANY shared key).
    """
    if sr <= 0:
        return []
    x = np.asarray(pcm, dtype=np.float64)[: int(round(max_s * sr))]
    sub = fingerprint_bits(x, sr)
    if sub.size < kgram:
        return []
    hexes = [format(int(v), "04x") for v in sub]
    return sorted({"".join(hexes[i : i + kgram]) for i in range(len(hexes) - kgram + 1)})


def fp_int_keys(
    pcm: np.ndarray, sr: int, kgram: int = FP_IKGRAM, max_s: float = FP_MAX_S
) -> list[int]:
    """Distinct integer k-gram keys (sorted) for a clip's fingerprint head.

    Each key packs kgram consecutive uint16 sub-fingerprints big-endian into
    one int (kgram=2 -> 32 bits). Integer keys make the robust lane's
    radius-1 Hamming-ball expansion a pure XOR against 16*kgram+1 masks —
    expressible natively in Spark (bitwiseXOR) AND DuckDB (xor), so the
    oracle fixture only ever stores the exact keys."""
    if sr <= 0:
        return []
    x = np.asarray(pcm, dtype=np.float64)[: int(round(max_s * sr))]
    sub = fingerprint_bits(x, sr)
    if sub.size < kgram:
        return []
    vals = {
        int(sum(int(sub[i + j]) << (16 * (kgram - 1 - j)) for j in range(kgram)))
        for i in range(len(sub) - kgram + 1)
    }
    return sorted(vals)


def aug_mulaw_variant(pcm: np.ndarray) -> np.ndarray:
    """Deterministic COARSE near-duplicate: gain AUG_MULAW_GAIN, then an
    8-bit mu-law companding round-trip — the re-encode class the exact-key
    lane documents as out of reach (~4% fingerprint-bit flips). Ground
    truth for the Hamming-ball robust lane (q40)."""
    return decode(encode(AUG_MULAW_GAIN * np.asarray(pcm, dtype=np.float64), "mulaw"), "mulaw")


def aug_variant(pcm: np.ndarray) -> np.ndarray:
    """Deterministic near-duplicate of a decoded clip: gain AUG_GAIN, then a
    pcm16 re-encode round-trip (requantization). Used to plant ground-truth
    audio near-dups for the fingerprint operator's tests and oracle."""
    return decode(encode(AUG_GAIN * np.asarray(pcm, dtype=np.float64), "pcm16"), "pcm16")
