"""Clipping / saturation audio audit: hard-clip (flat-top) detection.

The amplitude-domain defect the other recording-chain audits cannot
express: an overdriven gain stage saturates the converter, writing runs of
samples pinned at the codec's digital full-scale codes. Integrity (q166,
core/integrity.py) detects runs of EQUAL values anywhere in the range —
but a slow tone through a coarse codec plateaus legitimately, so its
stuck-run lane needs a 10 ms threshold; clipping is the stricter,
amplitude-anchored statement: the run sits exactly AT the saturation
bound, where natural corpus content only ever lands as isolated single
samples (measured ceiling below).

Saturation bounds are EXACT decoded-domain values derived from the codec's
own decode map (core/audio.py): the top/bottom code of each codec decodes
to one precise float64, so "sample is saturated" is an exact equality-class
test (>= hi or <= lo), not a tolerance guess. Measured on the pinned
corpus (4 000 clips): max natural saturated run = 1 sample, max natural
saturated fraction = 0.89 % = 2^-6.8 (coarse-codec top-code touches on
mulaw/alaw/pcm8); pcm16/float32 never touch full scale. The verdict
requires BOTH a run >= 4 samples (4x the natural ceiling) and a saturated
fraction >= 2^-6 (1.56 %), so base false positives are structurally zero
while plants at power-of-two gain saturate >= 50 % of samples in long runs.

Determinism / host-portability contract (committed-fixture rule, same as
core/electrical.py): equality/compare tests on exact decoded values,
cross-multiplied integer thresholds (no division in any verdict),
frexp-based log2 band for the reported ratio. All EMITTED metrics are
integers/booleans; floats stay internal.

>>> import numpy as np
>>> x = 0.5 * np.sin(np.arange(16000) / 7.0)
>>> m = clipping_metrics(x, "pcm16")
>>> (m["n_clipped"], m["clipped"], m["keep"])
(0, False, True)
>>> m = clipping_metrics(clipping_variant(x, "pcm16", "u-7"), "pcm16")
>>> (m["clipped"], m["keep"], m["max_clip_run"] >= 4)
(True, False, True)
"""

from __future__ import annotations

import math
import zlib

import numpy as np

from .audio import _ALAW_DEC, _I16_MAX, _MU_DEC
from .integrity import _max_run
from .spectral import _floor_log2_ratio

CLIP_RUN_MIN = 4  # flat-top: saturated run >= 4 samples (natural max 1)
CLIP_FRAC_LOG2 = -6  # and saturated fraction >= 2^-6 (natural max 2^-6.8)
PLANT_OVERDRIVE_LOG2 = (3, 4)  # planted overdrive: peak driven to 8x/16x bound

# decoded-domain saturation bounds per codec: the exact float64 values the
# top / bottom code of each codec decodes to (core/audio.py decode maps)
SAT_BOUNDS: dict[str, tuple[float, float]] = {
    "pcm16": (-32768.0 / _I16_MAX, 32767.0 / _I16_MAX),
    "pcm8": (-128.0 * 256.0 / _I16_MAX, 127.0 * 256.0 / _I16_MAX),
    "float32": (-1.0, 1.0),
    "mulaw": (float(_MU_DEC.min()) / _I16_MAX, float(_MU_DEC.max()) / _I16_MAX),
    "alaw": (float(_ALAW_DEC.min()) / _I16_MAX, float(_ALAW_DEC.max()) / _I16_MAX),
}


def clipping_metrics(pcm: np.ndarray | None, codec: str | None) -> dict:
    """Integer/boolean clipping audit of decoded PCM:

    * n_samples   — decoded length (0: nothing to judge, keep)
    * n_clipped   — samples exactly at/beyond the codec saturation bounds
    * n_clip_runs — maximal saturated runs (any length)
    * max_clip_run — longest saturated run in samples
    * clip_log2   — floor(log2(n_clipped / n_samples)); None when zero
    * clipped     — max run >= CLIP_RUN_MIN and fraction >= 2^CLIP_FRAC_LOG2
    * keep        — not clipped

    >>> clipping_metrics(None, "pcm16")["keep"]
    True
    >>> clipping_metrics(np.zeros(100), "pcm16")["n_clipped"]
    0
    """
    out = {
        "n_samples": 0,
        "n_clipped": 0,
        "n_clip_runs": 0,
        "max_clip_run": 0,
        "clip_log2": None,
        "clipped": False,
        "keep": True,
    }
    if pcm is None or codec not in SAT_BOUNDS:
        return out
    x = np.asarray(pcm, dtype=np.float64)
    n = x.size
    out["n_samples"] = int(n)
    if n == 0:
        return out
    lo, hi = SAT_BOUNDS[codec]
    mask = (x >= hi) | (x <= lo)
    nc = int(mask.sum())
    out["n_clipped"] = nc
    if nc:
        d = np.diff(np.concatenate([[0], mask.astype(np.int8), [0]]))
        out["n_clip_runs"] = int((d == 1).sum())
        out["max_clip_run"] = _max_run(mask)
        out["clip_log2"] = _floor_log2_ratio(float(nc), float(n))
        out["clipped"] = out["max_clip_run"] >= CLIP_RUN_MIN and float(
            nc
        ) >= math.ldexp(float(n), CLIP_FRAC_LOG2)
    out["keep"] = not out["clipped"]
    return out


def clipping_variant(pcm: np.ndarray, codec: str, clip_id: str) -> np.ndarray | None:
    """Deterministic planted HARD-CLIP variant: the clip overdriven to an
    id-hashed 8x or 16x of its own codec's saturation bound and clamped —
    ground truth for q171, the amplitude-domain analogue of the integrity
    plants (q166). Id-HASH derivation only (the q156 rule): defined for
    arbitrary ids.

    The gain is the smallest power of two taking the clip's own peak to
    >= overdrive x bound, so g*x is IEEE-exact and np.clip writes the bound
    values verbatim — the variant's saturated samples hit the detection
    equality classes exactly on any host. Overdrive is amplitude-relative
    (not a fixed gain) so even quiet clips saturate, and deep (8x/16x) so
    even near-Nyquist tones (datagen reaches 0.45*sr) produce flat-top runs
    >= CLIP_RUN_MIN: |x| >= peak/8 holds for >= 3/4 of any corpus signal's
    samples, so 4-sample runs are structural, not probabilistic. Returns
    None for empty/silent input or unknown codec (nothing to overdrive).
    """
    if codec not in SAT_BOUNDS:
        return None
    x = np.asarray(pcm, dtype=np.float64)
    if x.size == 0 or not np.any(x != 0.0):
        return None
    lo, hi = SAT_BOUNDS[codec]
    peak = float(np.max(np.abs(x)))
    bound = min(hi, -lo)
    over = PLANT_OVERDRIVE_LOG2[(zlib.crc32((clip_id + "#clip").encode()) >> 8) & 1]
    # smallest k with 2^k * peak >= 2^over * bound, via exact exponents
    _, ep = math.frexp(peak)
    _, eb = math.frexp(bound)
    k = eb + over - ep
    if math.ldexp(peak, k) < math.ldexp(bound, over):
        k += 1
    g = math.ldexp(1.0, max(k, 1))
    return np.clip(g * x, lo, hi)
