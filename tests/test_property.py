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
