"""Effective-bit-depth audio audit: bit-crush / re-quantization fraud.

The resolution-domain defect the other recording-chain audits cannot
express: a payload whose container claims 16-bit (or float) precision but
whose samples all sit on a coarser quantization grid was bit-crushed or
round-tripped through a lower-resolution encode — the bit-depth analogue
of the narrowband "fake sample rate" transcode q46 flags. Exactly
detectable: map decoded samples back to the 16-bit integer grid
(rint(x * 32767) — the inverse of the core/audio.py linear decodes, exact
by IEEE round-to-nearest) and take the gcd of the nonzero magnitudes. A
payload quantized to a 2^k-step grid has gcd divisible by 2^k; genuine
full-resolution content has gcd 1 with overwhelming probability (one
off-grid sample breaks it).

Scope: linear codecs only (pcm16, pcm8, float32). Companded mulaw/alaw
decode to a deliberately NONUNIFORM grid, so a uniform-gcd statement is
meaningless there — those rows are emitted unjudged (eff_bits None, keep),
like the electrical audit's undecodable rows. float32's nominal is the
16-bit MEASUREMENT grid ceiling: the audit certifies "at least 16 bits of
grid", it cannot see deeper — documented limitation, not a tolerance.

Measured on the pinned corpus (4 000 clips): every natural clip measures
EXACTLY its nominal depth (pcm16/float32 gcd 1 -> 16 bits; pcm8 gcd 256 ->
8 bits — the decode grid itself). The verdict requires a >= 2-bit deficit
(eff_bits + 2 <= nominal), so base false positives are structurally zero
while plants at 4/6 bits sit >= 2 bits below every nominal.

Determinism / host-portability contract (committed-fixture rule, same as
core/clipping.py): IEEE multiply + rint + integer gcd only — no libm, no
tolerance anywhere. All EMITTED metrics are integers/booleans.

>>> import numpy as np
>>> x = np.sin(np.arange(16000) / 7.0) * 0.5
>>> m = bitdepth_metrics(x, "pcm16")
>>> (m["eff_bits"], m["depth_fraud"], m["keep"])
(16, False, True)
>>> m = bitdepth_metrics(bitdepth_variant(x, "pcm16", "u-7"), "pcm16")
>>> (m["eff_bits"] <= 6, m["depth_fraud"], m["keep"])
(True, True, False)
"""

from __future__ import annotations

import zlib

import numpy as np

from .audio import _I16_MAX

NOMINAL_BITS = {"pcm16": 16, "pcm8": 8, "float32": 16}
FRAUD_MARGIN = 2  # fraud when eff_bits + 2 <= nominal (natural deficit: 0)
PLANT_BITS = (6, 4)  # id-hashed planted crush depths (power-of-two grids)


def bitdepth_metrics(pcm: np.ndarray | None, codec: str | None) -> dict:
    """Integer/boolean effective-bit-depth audit of decoded PCM:

    * n_nonzero    — samples off the zero code (0: unjudgeable, keep)
    * grid_gcd     — gcd of |rint(x * 32767)| over nonzero samples; None
                     when unjudgeable (companded codec, silence)
    * eff_bits     — 16 - floor(log2(grid_gcd)): the measured grid depth
    * nominal_bits — the codec's claimed depth (16-bit ceiling for float32)
    * depth_fraud  — eff_bits + FRAUD_MARGIN <= nominal_bits
    * keep         — not depth_fraud

    >>> bitdepth_metrics(None, "pcm16")["keep"]
    True
    >>> bitdepth_metrics(np.zeros(100), "pcm16")["eff_bits"] is None
    True
    >>> bitdepth_metrics(np.ones(8) * 0.25, "mulaw")["eff_bits"] is None
    True
    """
    nominal = NOMINAL_BITS.get(codec)
    out = {
        "n_nonzero": 0,
        "grid_gcd": None,
        "eff_bits": None,
        "nominal_bits": nominal,
        "depth_fraud": False,
        "keep": True,
    }
    if pcm is None or nominal is None:
        return out
    x = np.asarray(pcm, dtype=np.float64)
    if x.size == 0:
        return out
    ints = np.rint(x * _I16_MAX).astype(np.int64)
    nz = np.abs(ints[ints != 0])
    out["n_nonzero"] = int(nz.size)
    if nz.size == 0:
        return out
    g = int(np.gcd.reduce(nz))
    out["grid_gcd"] = g
    out["eff_bits"] = 16 - (g.bit_length() - 1)
    out["depth_fraud"] = out["eff_bits"] + FRAUD_MARGIN <= nominal
    out["keep"] = not out["depth_fraud"]
    return out


def bitdepth_variant(pcm: np.ndarray, codec: str, clip_id: str) -> np.ndarray | None:
    """Deterministic planted BIT-CRUSH variant: the clip re-quantized to an
    id-hashed 6- or 4-bit power-of-two grid — ground truth for q172, the
    resolution-domain analogue of the clipping plants (q171). Id-HASH
    derivation only (the q156 rule): defined for arbitrary ids.

    y = rint(x * 32767 / 2^(16-bits)) * 2^(16-bits) / 32767: the step is a
    power of two so the scaled division is exact, and the detection side's
    rint(y * 32767) recovers the grid integers exactly (round-trip error
    ~2 ulp << 0.5). Returns None for input that crushes to all-zero /
    empty, or a non-linear codec (nothing to certify against).
    """
    if codec not in NOMINAL_BITS:
        return None
    x = np.asarray(pcm, dtype=np.float64)
    if x.size == 0:
        return None
    bits = PLANT_BITS[(zlib.crc32((clip_id + "#bits").encode()) >> 8) & 1]
    step = float(1 << (16 - bits))
    k = np.rint(x * _I16_MAX / step)
    if not np.any(k != 0.0):
        return None
    return k * step / _I16_MAX
