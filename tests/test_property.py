"""Property-based edge-case tests (hypothesis) for the pure-python kernels.

These target the seams the example-based suites cannot enumerate: arbitrary
unicode through the text models (batch == per-row bitwise), arbitrary PCM
through every codec round-trip, and scrub idempotency. Kept fast
(max_examples bounded) so the full suite stays practical.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from datasmith_spark.core import audio, langid, lm
from datasmith_spark.core.scrub import scrub_text

_TEXT = st.text(max_size=200)


@settings(max_examples=150, deadline=None)
@given(st.lists(_TEXT, max_size=20))
def test_langid_batch_equals_one_on_arbitrary_unicode(texts):
    m = langid.model()
    bl, bp = m.predict_batch(texts)
    for i, t in enumerate(texts):
        lang, p = m.predict_one(t)
        assert bl[i] == lang and bp[i] == p


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_TEXT, st.sampled_from(["en", "de", "zh", "xx", None])), max_size=20))
def test_ppl_batch_equals_one_on_arbitrary_unicode(pairs):
    m = lm.model()
    texts = [t for t, _ in pairs]
    langs = [lg for _, lg in pairs]
    b = m.ppl_batch(texts, langs)
    for i, (t, lg) in enumerate(pairs):
        one = m.ppl_one(t, lg)
        assert (np.isinf(one) and np.isinf(b[i])) or one == b[i]


@settings(max_examples=100, deadline=None)
@given(
    st.sampled_from(audio.CODECS),
    st.lists(st.floats(min_value=-2.0, max_value=2.0, allow_nan=False), min_size=1, max_size=500),
)
def test_codec_roundtrip_bounded_error(codec, samples):
    """encode->decode must stay within the codec's quantization error for
    in-range signals (float32 exact at f32 precision; 8-bit codecs coarse)."""
    sig = np.asarray(samples, dtype=np.float64)
    buf = audio.encode(sig, codec)
    pcm = audio.decode(buf, codec)
    assert pcm is not None and pcm.size == sig.size
    # float32 is a pass-through codec (no clipping); the integer codecs
    # clip to [-1, 1] before quantizing
    ref = sig if codec == "float32" else np.clip(sig, -1.0, 1.0)
    tol = {"pcm16": 2e-4, "float32": 1e-5, "pcm8": 2e-2, "mulaw": 0.12, "alaw": 0.12}[codec]
    assert float(np.max(np.abs(pcm - ref))) <= tol, (codec, float(np.max(np.abs(pcm - ref))))


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64), st.sampled_from(audio.CODECS + ("opus", "bogus")))
def test_decode_never_crashes_on_garbage(buf, codec):
    pcm = audio.decode(buf, codec)
    if pcm is not None:
        feats = audio.pcm_features(pcm)
        assert len(feats) == 5 and feats[0] == pcm.size


@settings(max_examples=150, deadline=None)
@given(_TEXT)
def test_scrub_is_idempotent(text):
    """Scrubbing already-scrubbed text must change nothing and count zero
    new PII hits (placeholders must not re-match the patterns)."""
    s1, pii1, tox1 = scrub_text(text)
    s2, pii2, tox2 = scrub_text(s1)
    assert s2 == s1
    assert pii2 == 0


# ---------------------------------------------- audio quality kernels (r5)

_PCM = st.lists(
    st.floats(min_value=-1.5, max_value=1.5, allow_nan=False),
    min_size=1, max_size=3000,
)


@settings(max_examples=120, deadline=None)
@given(_PCM, st.sampled_from([1000, 8000, 16000]))
def test_vad_metrics_structural_invariants(samples, sr):
    from datasmith_spark.core.vad import active_span_samples, vad_metrics

    x = np.asarray(samples, dtype=np.float64)
    ns, nf, na, t0, t1, nc = vad_metrics(x, sr)
    frame = max(1, sr * 20 // 1000)
    assert ns == x.size and nf == x.size // frame
    assert 0 <= na <= nf and 0 <= nc <= ns
    if na:
        assert 0 <= t0 < t1 <= int(round(nf * frame / sr * 1000.0))
        span = active_span_samples(x, sr)
        assert span is not None and 0 <= span[0] < span[1] <= x.size
    else:
        assert t0 is None and t1 is None and active_span_samples(x, sr) is None


@settings(max_examples=80, deadline=None)
@given(_PCM)
def test_spectral_metrics_structural_invariants(samples):
    from datasmith_spark.core.spectral import N_FFT, spectral_metrics

    x = np.asarray(samples, dtype=np.float64)
    nb, nh, s, ok, bw, narrow = spectral_metrics(x)
    if x.size < N_FFT:
        assert (nb, nh, s, ok, bw, narrow) == (0, 0, None, False, None, False)
    else:
        assert nb == N_FFT // 2 + 1 and 0 <= nh <= nb
        if bw is None:
            assert not ok and not narrow and s is None  # zero-energy clip
        else:
            assert 0 <= bw <= nb - 1


@settings(max_examples=80, deadline=None)
@given(_PCM, st.integers(min_value=-3, max_value=3))
def test_spectral_metrics_invariant_under_pow2_gain(samples, e):
    """Exact power-of-two gain is lossless in IEEE-754, and every predicate
    in the kernel is a ratio — all six outputs must be identical."""
    from datasmith_spark.core.spectral import spectral_metrics

    x = np.asarray(samples, dtype=np.float64)
    assert spectral_metrics(x) == spectral_metrics(x * (2.0 ** e))


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=1e-300, max_value=1e300, allow_nan=False),
    st.floats(min_value=1e-300, max_value=1e300, allow_nan=False),
)
def test_floor_log2_ratio_matches_exact_fraction(num, den):
    """frexp-based floor(log2(num/den)) == the EXACT answer computed with
    arbitrary-precision Fractions (doubles are rationals, so this is a
    full-precision cross-check with no float log anywhere)."""
    from fractions import Fraction

    from datasmith_spark.core.spectral import _floor_log2_ratio

    k = _floor_log2_ratio(num, den)
    r = Fraction(num) / Fraction(den)
    assert Fraction(2) ** k <= r < Fraction(2) ** (k + 1)


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**6),
    st.one_of(st.none(), st.integers(min_value=0, max_value=10**6)),
)
def test_speaking_rate_keep_matches_float_window(n_chars, active_ms):
    """The integer cross-multiplied window == the float cps compare
    (exactly, because 1000*n and cps*ms are exact integers)."""
    from datasmith_spark.core.spectral import speaking_rate_keep

    got = speaking_rate_keep(n_chars, active_ms)
    if not active_ms or n_chars <= 0:
        assert not got
    else:
        cps = 1000.0 * n_chars / active_ms
        # compare in exact integers on the boundary like the kernel does
        lo_ok = 1000 * n_chars >= 2 * active_ms
        hi_ok = 1000 * n_chars <= 40 * active_ms
        assert got == (lo_ok and hi_ok)
        if 2.001 < cps < 39.999:
            assert got


@settings(max_examples=60, deadline=None)
@given(
    st.sampled_from(audio.CODECS),
    st.lists(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False),
             min_size=8, max_size=400),
)
def test_normalize_peak_lands_at_or_below_target(codec, samples):
    """Normalized output never exceeds the target peak by more than the
    codec quantization step, and silent input is passed through untouched."""
    from datasmith_spark.operators.audio_ops import NORM_TARGET_PEAK, _normalize_pdf
    import pandas as pd

    sig = np.asarray(samples, dtype=np.float64)
    buf = audio.encode(sig, codec)
    pdf = pd.DataFrame(
        {"clip_id": ["c"], "bytes": [buf], "sr_hz": pd.array([8000], dtype="Int32"),
         "dur_ms": pd.array([50], dtype="Int32"), "codec": [codec],
         "transcript": ["t"]}
    )
    out = _normalize_pdf(pdf, NORM_TARGET_PEAK, digest=False)
    got = audio.decode(bytes(out["bytes"].iloc[0]), codec)
    if float(np.max(np.abs(audio.decode(buf, codec)))) == 0.0:
        assert not bool(out["normalized"].iloc[0])
        assert bytes(out["bytes"].iloc[0]) == buf
    else:
        assert bool(out["normalized"].iloc[0])
        step = {"pcm16": 2e-4, "float32": 1e-6, "pcm8": 2e-2,
                "mulaw": 0.12, "alaw": 0.12}[codec]
        assert float(np.max(np.abs(got))) <= NORM_TARGET_PEAK + step


# ---------------------------------------------------------- r5s3 kernels

_PCM = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=0,
    max_size=4000,
)


@settings(max_examples=60, deadline=None)
@given(_PCM, st.sampled_from([(9, 10), (10, 10), (11, 10), (1, 2), (2, 1)]))
def test_speed_output_length_is_exact_ratio(pcm, factor):
    from datasmith_spark.core.resample import resample

    num, den = factor
    x = np.asarray(pcm, dtype=np.float64)
    y = resample(x, num, den)
    if num == den:
        assert np.array_equal(y, x)
    else:
        assert y.size == int(round(x.size * den / num))
    assert np.all(np.isfinite(y))


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=400),
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=60),
)
def test_segment_starts_tile_any_span(n_frames, seg, hop):
    """The window-start arithmetic used by _segment_pdf: full windows every
    hop, else the whole span once — coverage never exceeds the span and
    starts are strictly increasing."""
    lo, hi = 7, 7 + n_frames
    starts = list(range(lo, hi - seg + 1, hop))
    if not starts:
        assert hi - lo < seg  # only short spans fall back to keep-whole
    else:
        assert starts[0] == lo
        assert all(s + seg <= hi for s in starts)
        assert all(b - a == hop for a, b in zip(starts, starts[1:]))
        # the dropped tail is shorter than one window
        assert hi - (starts[-1] + seg) < hop or starts[-1] + seg + hop > hi - seg + 1


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-60.0, max_value=10.0, allow_nan=False),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=60,
    )
)
def test_cmvn_output_stats_bounded(rows):
    from datasmith_spark.core.resample import cmvn

    f = np.asarray(rows, dtype=np.float64)
    out = cmvn(f)
    assert out.shape == f.shape
    assert np.all(np.isfinite(out))
    # per-band mean is ~0 and variance never exceeds 1 (floor only shrinks)
    assert np.allclose(out.mean(axis=0), 0.0, atol=1e-9)
    assert np.all(out.var(axis=0) <= 1.0 + 1e-9)


@settings(max_examples=80, deadline=None)
@given(st.text(min_size=0, max_size=60), st.integers(min_value=1, max_value=300))
def test_spec_augment_only_zeroes_and_preserves_rest(key, n_t):
    from datasmith_spark.core.resample import spec_augment

    f = np.full((n_t, 40), 3.25)
    out = spec_augment(f, key)
    # every cell is either untouched or exactly zero
    assert np.all((out == 3.25) | (out == 0.0))
    # deterministic in the key
    assert np.array_equal(out, spec_augment(f, key))


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=2048, max_value=20000),
    st.sampled_from([(9, 8), (8, 9), (12, 11), (11, 12)]),
    st.floats(min_value=50.0, max_value=2000.0),
)
def test_pitch_shift_preserves_duration(n, factor, f0):
    """pitch_shift output length stays within one WSOLA frame of the input
    for any clip long enough to stretch (duration is the invariant the
    composition exists to protect)."""
    from datasmith_spark.core.resample import pitch_shift

    num, den = factor
    x = 0.4 * np.sin(2 * np.pi * f0 * np.arange(n) / 16000.0)
    y = pitch_shift(x, num, den)
    if y is None:
        # only permissible for clips whose RESAMPLED form is too short
        assert round(n * den / num) < 2 * 512
    else:
        assert abs(y.size - n) <= 512


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=0, max_value=10_000),
)
def test_landmark_translation_equivariance_property(m, gain_pow, seed):
    """For ANY signal, hop-multiple delay + power-of-two gain translates
    every anchor-t>=1 landmark exactly by m frames (core/landmark.py's
    shift-invariance contract, fuzzed over signals/delays/gains)."""
    from datasmith_spark.core.landmark import LM_HOP, landmark_hashes16

    rng = np.random.default_rng(seed)
    t = np.arange(16000) / 16000.0
    f1, f2 = rng.uniform(100, 3000, 2)
    x = (
        0.6 * np.sin(2 * np.pi * f1 * t)
        + 0.3 * np.sin(2 * np.pi * f2 * t)
        + 0.05 * rng.standard_normal(t.size)
    )
    base = [(h, tt) for h, tt in landmark_hashes16(x) if tt >= 1]
    y = np.concatenate([np.zeros(m * LM_HOP), x * 2.0**-gain_pow])
    shifted = set(landmark_hashes16(y))
    assert all((h, tt + m) in shifted for h, tt in base)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.sampled_from([(9, 10), (19, 20), (21, 20), (11, 10), (5, 4), (4, 5)]),
)
def test_specsig_rate_recovery_property(seed, factor):
    """For ANY 2-3 well-separated in-band tone set, the rate hypothesis
    recovers ANY plausible-band resampling factor to bin tolerance
    (core/specsig.py's contract, fuzzed over tone sets and factors)."""
    from datasmith_spark.core.resample import resample
    from datasmith_spark.core.specsig import (
        SS_NFFT,
        SS_TOL,
        rate_hypothesis,
        tone_peaks16,
    )

    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 4))
    # well-separated tones, far enough below the band edge that the
    # largest factor keeps every image measurable (no exemption path)
    freqs = np.sort(rng.uniform(150.0, 4500.0, n))
    while np.any(np.diff(freqs) < 120.0):
        freqs = np.sort(rng.uniform(150.0, 4500.0, n))
    t = np.arange(3 * 16000) / 16000.0
    x = sum(
        w * np.sin(2 * np.pi * f * t)
        for f, w in zip(freqs, rng.uniform(0.3, 1.0, n))
    ) + 0.03 * rng.standard_normal(t.size)
    pa = tone_peaks16(x)
    num, den = factor
    pb = tone_peaks16(resample(x, num, den))
    if len(pa) != n or len(pb) != n:
        return  # a tone merged/vanished: out of the property's premise
    hyp = rate_hypothesis(pa, pb)
    assert hyp is not None and abs(hyp[0] * num - den * hyp[1]) <= SS_TOL * num
