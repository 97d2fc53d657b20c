"""Codec kernels: round-trip SNR >= 30 dB, failure modes, LUT consistency."""

import numpy as np
import pytest

from datasmith_spark.core import audio


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(123)
    t = np.arange(32000) / 16000.0
    sig = (
        0.6 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1330 * t + 0.7)
        + 0.02 * rng.standard_normal(t.size)
    )
    return np.clip(sig, -0.999, 0.999)


@pytest.mark.parametrize("codec", audio.CODECS)
def test_roundtrip_snr(codec, signal):
    dec = audio.decode(audio.encode(signal, codec), codec)
    assert dec is not None and dec.size == signal.size
    assert audio.snr_db(signal, dec) >= 30.0, codec


@pytest.mark.parametrize("codec", ["pcm16", "float32", "mulaw", "alaw"])
def test_roundtrip_quiet_signal(codec, signal):
    # companded codecs (and 16+ bit) must hold SNR even at -26 dBFS;
    # pcm8 is excluded: linear 8-bit has a ~50 dB full-scale ceiling, so at
    # 0.05 amplitude its theoretical SNR is ~14 dB (verified below).
    quiet = signal * 0.05
    dec = audio.decode(audio.encode(quiet, codec), codec)
    assert audio.snr_db(quiet, dec) >= 30.0, codec


def test_pcm8_quiet_matches_quantization_theory(signal):
    quiet = signal * 0.05
    dec = audio.decode(audio.encode(quiet, "pcm8"), "pcm8")
    got = audio.snr_db(quiet, dec)
    # 6.02*8 + 1.76 - 20*log10(1/0.05) ~= 24.7 dB upper bound for a sine;
    # measured should be in a plausible quantization-noise range
    assert 8.0 < got < 25.0, got


def test_decode_failure_modes():
    assert audio.decode(b"", "pcm16") is None
    assert audio.decode(None, "pcm16") is None
    assert audio.decode(b"\x01\x02\x03", "pcm16") is None  # misaligned
    assert audio.decode(b"\x01\x02\x03", "float32") is None
    assert audio.decode(b"\x01\x02", "opus") is None  # unknown codec
    assert audio.decode(b"\x01", "mulaw") is not None  # 1-byte codecs align


def test_g711_code_roundtrip():
    # encode(decode(code)) == code for every 8-bit code (mu-law: the two
    # +/-0 codes are equivalent by spec, so allow exactly one alias)
    mu = audio._mulaw_encode_i16(audio._MU_DEC.astype(np.int16))
    assert (mu == np.arange(256)).sum() >= 255
    al = audio._alaw_encode_i16(audio._ALAW_DEC.astype(np.int16))
    assert (al == np.arange(256)).all()


def test_features_deterministic_and_finite():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(1000) * 0.3
    f1 = audio.pcm_features(x)
    f2 = audio.pcm_features(x.copy())
    assert f1 == f2
    n, rms, peak, clip, fin = f1
    assert n == 1000 and 0 < rms < peak and fin == 1.0


def test_features_nonfinite_flagged():
    x = np.array([0.1, np.nan, 0.2, np.inf])
    n, rms, peak, clip, fin = audio.pcm_features(x)
    assert fin == 0.5 and np.isfinite(rms) and np.isfinite(peak)


def test_sumsq_tree_is_host_portable():
    """rms's sum-of-squares must follow the documented fixed-order reduction
    exactly (pure-scalar reference, no numpy reductions involved), so the
    committed oracle fixture is reproducible bit-for-bit on any host/BLAS:
    strict left fold into 4096 lanes, then a balanced halving tree."""
    import math

    L = audio._SUMSQ_LANES
    rng = np.random.default_rng(7)
    for n in [1, 2, 3, 5, 127, 4095, 4096, 4097, 10000, 31999]:
        x = rng.standard_normal(n)
        sq = [float(v) * float(v) for v in x.tolist()]
        lanes = [0.0] * L
        for i, v in enumerate(sq):  # strict left fold per lane
            lanes[i % L] = lanes[i % L] + v
        while len(lanes) > 1:  # balanced halving tree over the lanes
            lanes = [lanes[i] + lanes[i + 1] for i in range(0, len(lanes), 2)]
        got = audio._sumsq_tree(x)
        assert got == lanes[0], n
        # and the reduction is numerically sane vs the exact (fsum) result
        exact = math.fsum(sq)
        assert abs(got - exact) <= 1e-9 * max(1.0, abs(exact)), n
