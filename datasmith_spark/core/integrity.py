"""Sample-level audio integrity audit: dropout and stuck-sample detection.

The digital-artifact curation signals the ENERGY (core/vad.py) and SPECTRUM
(core/spectral.py) kernels cannot express: a buffer underrun writes an
exact-ZERO run into the payload, a stuck DAC/serializer repeats one sample
value — both inaudible to frame-energy heuristics when short, both fatal to
a training example's usefulness when long, and both exactly detectable in
the integer/float sample domain (the values are EXACT, not approximate, so
run-length is a precise audit, not a threshold guess).

Verdict thresholds are millisecond-based and cross-multiplied against the
clip's own sample rate (run_samples * 1000 >= MS * sr), so the audit is
rate-independent and all emitted metrics are integers. Measured on the
pinned corpus: natural zero runs max 0.375 ms and stuck runs max 0.75 ms —
a 10 ms threshold sits 13x above the natural ceiling, so plants at >= 12 ms
separate with zero false positives.

>>> import numpy as np
>>> x = np.sin(np.arange(8000) / 5.0) * 0.5
>>> m = integrity_metrics(x, 16000)
>>> (m["max_zero_run"] <= 1, m["max_rep_run"] <= 1, m["keep"])
(True, True, True)
>>> y = x.copy(); y[1000:1480] = 0.0  # 30 ms dropout at 16 kHz
>>> m = integrity_metrics(y, 16000)
>>> (m["max_zero_run"], m["dropout"], m["keep"])
(480, True, False)
>>> z = x.copy(); z[2000:2400] = z[2000]  # 25 ms stuck value
>>> m = integrity_metrics(z, 16000)
>>> (m["max_rep_run"], m["stuck"], m["keep"])
(400, True, False)
"""

from __future__ import annotations

import zlib

import numpy as np

INTEG_ZERO_MS = 10  # dropout: exact-zero run >= 10 ms
INTEG_REP_MS = 10  # stuck: one nonzero value repeated >= 10 ms
PLANT_DROP_MIN_MS, PLANT_DROP_MOD_MS = 12, 28  # planted dropout: 12..39 ms
PLANT_STUCK_MIN_MS, PLANT_STUCK_MOD_MS = 12, 28


def _max_run(mask: np.ndarray) -> int:
    """Longest run of True in a boolean mask (0 when empty/all-False)."""
    if mask.size == 0 or not mask.any():
        return 0
    d = np.diff(np.concatenate([[0], mask.astype(np.int8), [0]]))
    starts = np.where(d == 1)[0]
    ends = np.where(d == -1)[0]
    return int((ends - starts).max())


def integrity_metrics(pcm: np.ndarray, sr: int) -> dict:
    """All-integer integrity audit of decoded PCM:
    max_zero_run / max_rep_run in SAMPLES (a rep run of length L means L
    consecutive samples share one nonzero value), dropout / stuck flags
    from the cross-multiplied ms thresholds, keep = neither."""
    x = np.asarray(pcm, dtype=np.float64)
    mz = _max_run(x == 0.0)
    eq = np.concatenate([[False], (x[1:] == x[:-1]) & (x[1:] != 0.0)])
    mr = _max_run(eq) + 1 if eq.any() else (1 if x.size else 0)
    dropout = mz * 1000 >= INTEG_ZERO_MS * sr
    stuck = mr * 1000 >= INTEG_REP_MS * sr
    return {
        "n_samples": int(x.size),
        "max_zero_run": mz,
        "max_rep_run": int(mr),
        "dropout": bool(dropout),
        "stuck": bool(stuck),
        "keep": not dropout and not stuck,
    }


def corrupted_variant(pcm: np.ndarray, sr: int, clip_id: str) -> np.ndarray:
    """Deterministic planted CORRUPTED variant: one id-hashed dropout
    (exact zeros, 12..39 ms) and one id-hashed stuck run (12..39 ms of a
    repeated sample), positions anywhere in the clip — ground truth for
    q166, the integrity analogue of the audio dup-planting lanes. Id-HASH
    derivation only (the q156 rule): defined for arbitrary ids.

    Plants live in disjoint halves (stuck in [0, n/2), dropout in [n/2, n))
    so neither can shorten the other below its threshold; clips shorter
    than ~2x the max plant length are left for the caller to skip (the
    operator plants only when the clip holds >= 120 ms)."""
    x = np.asarray(pcm, dtype=np.float64).copy()
    n = x.size
    if n == 0:
        return x
    half = n // 2
    hz = zlib.crc32((clip_id + "#drop").encode())
    hs = zlib.crc32((clip_id + "#stuck").encode())
    zlen = (PLANT_DROP_MIN_MS + hz % PLANT_DROP_MOD_MS) * sr // 1000
    slen = (PLANT_STUCK_MIN_MS + hs % PLANT_STUCK_MOD_MS) * sr // 1000
    s0 = (hs // 64) % max(half - slen, 1)
    seg = x[s0 : s0 + slen]
    if seg.size:
        v = float(seg[0])
        if v == 0.0:  # the stuck value must be nonzero to exercise the lane
            v = 0.25
        x[s0 : s0 + slen] = v
    z0 = half + (hz // 64) % max(n - half - zlen, 1)
    x[z0 : z0 + zlen] = 0.0
    return x
