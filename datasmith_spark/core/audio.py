"""Audio codec kernels: encode/decode for {pcm16, pcm8, float32, mulaw, alaw}.

Vectorized numpy, per-row deterministic (no batch-level state), so results are
invariant to Arrow batch size and partitioning. Decode returns float64 PCM in
[-1, 1]. G.711 mu-law / A-law follow the classic CCITT g711 reference
semantics (8-bit companded, 16/13-bit linear domain).

The reference system has no audio path; this module is the graft's analogue of
its blob handling (pickle BLOBs, /root/reference/src/datasmith/utils.py:106)
re-expressed as typed binary columns + vectorized decode.
"""

from __future__ import annotations

import numpy as np

CODECS = ("pcm16", "pcm8", "float32", "mulaw", "alaw")

# bytes per sample, used for native (Column-expr) alignment checks too
ITEMSIZE = {"pcm16": 2, "pcm8": 1, "float32": 4, "mulaw": 1, "alaw": 1}

_I16_MAX = 32767.0

# ---------------------------------------------------------------- G.711 mu-law

_MU_CLIP = 32635
_MU_BIAS = 0x84
# segment upper bounds for the biased magnitude (exponent search, exact ints)
_MU_SEG_BOUNDS = np.array([0x100, 0x200, 0x400, 0x800, 0x1000, 0x2000, 0x4000], dtype=np.int32)


def _mulaw_encode_i16(x: np.ndarray) -> np.ndarray:
    """int16 -> mu-law byte (uint8)."""
    x = x.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0).astype(np.int32)
    mag = np.minimum(np.abs(x), _MU_CLIP) + _MU_BIAS
    exponent = np.searchsorted(_MU_SEG_BOUNDS, mag, side="right").astype(np.int32)
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa) & 0xFF).astype(np.uint8)


def _mulaw_decode_table() -> np.ndarray:
    """256-entry mu-law -> int16 lookup table."""
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + _MU_BIAS) << exponent) - _MU_BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


_MU_DEC = _mulaw_decode_table()

# ---------------------------------------------------------------- G.711 A-law

# classic g711.c seg_aend table (13-bit domain upper bounds per segment)
_ALAW_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF], dtype=np.int32)


def _alaw_encode_i16(x: np.ndarray) -> np.ndarray:
    """int16 -> A-law byte (uint8), classic g711.c semantics (13-bit domain)."""
    x = x.astype(np.int32)
    mask = np.where(x >= 0, 0xD5, 0x55).astype(np.int32)
    pcm = x >> 3  # 16 -> 13 bit; pcm in [-4096, 4095]
    pcm = np.where(pcm < 0, -pcm - 1, pcm)  # in [0, 4095], never exceeds seg 7
    seg = np.searchsorted(_ALAW_SEG_AEND, pcm, side="left").astype(np.int32)
    aval = seg << 4
    low = (pcm >> 1) & 0x0F  # segments 0-1: linear step
    high = (pcm >> seg) & 0x0F
    aval = aval | np.where(seg < 2, low, high)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def _alaw_decode_table() -> np.ndarray:
    """256-entry A-law -> int16 lookup table (inverse of _alaw_encode_i16).

    g711.c alaw2linear: output is already in the 16-bit linear domain.
    """
    a = np.arange(256, dtype=np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    mag = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


_ALAW_DEC = _alaw_decode_table()

# ------------------------------------------------------------------- encode


def encode(pcm: np.ndarray, codec: str) -> bytes:
    """float64/float32 PCM in [-1, 1] -> encoded bytes for `codec`.

    >>> encode(np.array([0.0, 1.0]), "pcm16")
    b'\\x00\\x00\\xff\\x7f'
    >>> len(encode(np.zeros(3), "mulaw"))
    3
    """
    if codec == "float32":
        return np.asarray(pcm, dtype="<f4").tobytes()
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    i16 = np.rint(x * _I16_MAX).astype(np.int16)
    if codec == "pcm16":
        return i16.astype("<i2").tobytes()
    if codec == "pcm8":
        return ((i16.astype(np.int32) >> 8) + 128).astype(np.uint8).tobytes()
    if codec == "mulaw":
        return _mulaw_encode_i16(i16).tobytes()
    if codec == "alaw":
        return _alaw_encode_i16(i16).tobytes()
    raise ValueError(f"unknown codec: {codec}")


# ------------------------------------------------------------------- decode


def decode(buf: bytes | None, codec: str) -> np.ndarray | None:
    """Encoded bytes -> float64 PCM in [-1, 1]. None => undecodable.

    Failure modes (all deterministic): unknown codec, empty buffer,
    buffer length not a multiple of the codec itemsize.
    Non-finite float32 payloads decode successfully here; the pipeline's
    decode stage flags them via the finite-fraction feature.

    >>> decode(encode(np.array([0.0, 0.25, -0.5]), "float32"), "float32").tolist()
    [0.0, 0.25, -0.5]
    >>> decode(b"\\x00", "pcm16") is None   # misaligned for itemsize 2
    True
    >>> decode(b"", "pcm8") is None
    True
    >>> decode(b"\\x00\\x00", "opus") is None  # unknown codec
    True
    """
    if buf is None or codec not in ITEMSIZE:
        return None
    n = len(buf)
    if n == 0 or n % ITEMSIZE[codec] != 0:
        return None
    # in-place arithmetic on the freshly-allocated float64 array: one temp
    # allocation per decode instead of two (page-fault-bound kernels; values
    # are bit-identical to the out-of-place form)
    if codec == "pcm16":
        out = np.frombuffer(buf, dtype="<i2").astype(np.float64)
        out /= _I16_MAX
        return out
    if codec == "pcm8":
        out = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
        out -= 128.0
        out *= 256.0 / _I16_MAX
        return out
    if codec == "float32":
        return np.frombuffer(buf, dtype="<f4").astype(np.float64)
    if codec == "mulaw":
        out = _MU_DEC[np.frombuffer(buf, dtype=np.uint8)].astype(np.float64)
        out /= _I16_MAX
        return out
    if codec == "alaw":
        out = _ALAW_DEC[np.frombuffer(buf, dtype=np.uint8)].astype(np.float64)
        out /= _I16_MAX
        return out
    return None  # pragma: no cover


# ------------------------------------------------------------------ features

FEATURE_FIELDS = ("n_samples", "rms", "peak", "clip_rate", "finite_frac")


_SUMSQ_LANES = 4096  # power of two; lane count of the fixed-order reduction


def _sumsq_tree(x: np.ndarray) -> float:
    """Sum of squares with an explicitly fixed, host-portable reduction order.

    BLAS dot / np.sum reduction orders depend on the library build and SIMD
    width, so their results differ across hosts by a few ulps — enough to
    un-commit a bit-exact oracle fixture. This reduction's order is pinned
    by construction, using only ELEMENTWISE adds (one IEEE-754 operation
    per output element, nothing for SIMD/blocking to reorder):

      lane[j] = ((s[j] + s[j+L]) + s[j+2L]) + ...   strict left fold over
                L=4096-wide blocks (zero-padded tail), via np.add(out=acc)
      total   = balanced halving tree over the L lanes
                (acc[0::2] + acc[1::2], 12 levels)

    Same bits on any host, numpy, or BLAS. Cost: ~2n flops in two
    cache-friendly passes (measured ~2-3x a BLAS dot, vs ~50x for a full
    pairwise halving tree over n).
    """
    return _tree_sum(x * x)


def _tree_sum(s: np.ndarray) -> float:
    """Fixed-order tree sum of s itself (see _sumsq_tree for the contract:
    strict lane fold + balanced halving tree, bit-identical on any host).
    Shared by the sum-of-squares above and plain-sum consumers (the DC
    offset audit in core/electrical.py)."""
    n = s.size
    L = _SUMSQ_LANES
    acc = np.zeros(L, dtype=np.float64)
    nfull = (n // L) * L
    if nfull:
        blocks = s[:nfull].reshape(-1, L)
        for i in range(blocks.shape[0]):
            np.add(acc, blocks[i], out=acc)
    if n > nfull:
        tail = s[nfull:]
        np.add(acc[: tail.size], tail, out=acc[: tail.size])
    while acc.size > 1:
        acc = acc[0::2] + acc[1::2]
    return float(acc[0])


def pcm_features(
    pcm: np.ndarray | None, assume_finite: bool = False
) -> tuple[int, float, float, float, float]:
    """Per-row audio features: (n_samples, rms, peak, clip_rate, finite_frac).

    Per-row-only math (no cross-row normalization) so features are invariant
    to Arrow batch size — SURVEY.md §7.4 risk 1.

    assume_finite=True skips the isfinite scan — valid for every integer
    codec (int16/uint8 -> float64 is finite by construction) and produces
    the identical result bitwise (fin_frac n/n == 1.0, x is pcm), so the
    hinted Spark path and the unhinted oracle path agree exactly.
    """
    if pcm is None or pcm.size == 0:
        return 0, 0.0, 0.0, 0.0, 0.0
    if assume_finite:
        n_fin = pcm.size
        fin_frac = 1.0
    else:
        finite = np.isfinite(pcm)
        n_fin = int(finite.sum())
        fin_frac = float(np.float64(n_fin) / pcm.size)
    # all-finite fast path (every integer codec, and most float32 rows):
    # np.where(all-true, pcm, 0) is a bitwise copy, so skipping it changes
    # nothing. Feature passes:
    #   rms       via the fixed-order tree reduction above — bit-identical
    #             on ANY host/BLAS, so the committed oracle fixture
    #             (fixtures/oracle_labels_n4000.parquet) is host-portable;
    #   peak      = max(max(x), -min(x)) == max(|x|) exactly — no |x| temp;
    #   clip_rate counts x >= t and x <= -t — same set as |x| >= t.
    # This kernel is shared with the single-process oracle, so both sides
    # move together; the committed fixture is regenerated with it.
    x = pcm if n_fin == pcm.size else np.where(finite, pcm, 0.0)
    rms = float(np.sqrt(_sumsq_tree(x) / x.size))
    peak = float(max(x.max(), -x.min()))
    n_clip = int(np.count_nonzero(x >= 0.999)) + int(np.count_nonzero(x <= -0.999))
    clip_rate = float(np.float64(n_clip) / x.size)
    return int(pcm.size), rms, peak, clip_rate, fin_frac


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against `ref`, in dB.

    >>> snr_db(np.ones(4), np.ones(4)) > 250      # identical => ~300 dB floor
    True
    >>> round(snr_db(np.ones(4), np.zeros(4)), 6)  # all noise
    0.0
    """
    ref = np.asarray(ref, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    n = min(ref.size, test.size)
    ref, test = ref[:n], test[:n]
    noise = ref - test
    p_sig = float(np.mean(ref * ref)) + 1e-30
    p_noise = float(np.mean(noise * noise)) + 1e-30
    return 10.0 * np.log10(p_sig / p_noise)
