"""Pure-python baseline JPEG codec (operators/jpeg.py).

Round-trip PSNR against known-quality floors for the Annex K q50 tables,
every encoder/decoder profile knob (4:4:4, 4:2:0, restart markers,
grayscale, odd sizes), and flag-not-crash robustness on garbage input.
"""

from __future__ import annotations

import numpy as np
import pytest

from datasmith_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10.0 * np.log10(255.0**2 / max(mse, 1e-12))


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            yy * 255 // max(h - 1, 1),
            xx * 255 // max(w - 1, 1),
            (yy + xx) * 255 // max(h + w - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "kw,psnr_floor",
    [
        ({}, 35.0),
        ({"subsample": True}, 30.0),
        ({"restart_interval": 2}, 35.0),
        ({"subsample": True, "restart_interval": 3}, 30.0),
    ],
    ids=["444", "420", "444+rst", "420+rst"],
)
def test_roundtrip_smooth(kw, psnr_floor):
    img = _gradient(24, 32)
    buf = encode_jpeg(img, **kw)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    dec = decode_jpeg(buf)
    assert dec is not None and dec.shape == img.shape
    assert _psnr(dec, img) >= psnr_floor


@pytest.mark.parametrize("hw", [(7, 5), (17, 19), (8, 8), (1, 1), (9, 16)])
@pytest.mark.parametrize("subsample", [False, True])
def test_odd_sizes(hw, subsample):
    h, w = hw
    img = np.random.default_rng(h * 100 + w).integers(0, 256, (h, w, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, subsample=subsample))
    assert dec is not None and dec.shape == img.shape
    # DC (block means) survives even harsh quantization of noise
    assert abs(float(dec.mean()) - float(img.mean())) < 16.0


def test_grayscale_roundtrip():
    img = _gradient(16, 24)[..., 0]
    dec = decode_jpeg(encode_jpeg(img))
    assert dec is not None and dec.shape == (16, 24, 3)
    # single-component frames replicate luma into all three channels
    assert (dec[..., 0] == dec[..., 1]).all() and (dec[..., 1] == dec[..., 2]).all()
    assert _psnr(dec[..., 0], img) >= 35.0


def test_grayscale_restart():
    img = _gradient(24, 24)[..., 1]
    dec = decode_jpeg(encode_jpeg(img, restart_interval=2))
    assert dec is not None and _psnr(dec[..., 0], img) >= 35.0


def test_determinism():
    img = _gradient(24, 32)
    assert encode_jpeg(img) == encode_jpeg(img)


def test_bit_accumulators_stay_bounded():
    """The entropy reader/writer must truncate their accumulators to the
    live bits — an unbounded Python bignum makes every shift O(stream) and
    the whole codec O(n^2) (r4 ADVICE). A 64x64 noise image pushes ~10k+
    coded bytes through both paths; the accumulators must stay word-sized."""
    from datasmith_spark.operators.jpeg import _BitReader, _BitWriter

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    buf = encode_jpeg(img)
    assert decode_jpeg(buf) is not None

    bw = _BitWriter()
    for v in rng.integers(0, 1 << 13, 4096):
        bw.write(int(v), 13)
        assert bw.acc.bit_length() <= bw.nbits
    bw.flush()
    br = _BitReader(bytes(bw.buf), 0)
    for _ in range(4096 * 13 // 8):
        br.read_bits(8)
        assert br.acc.bit_length() <= br.nbits + 1


def test_garbage_returns_none_not_crash():
    img = _gradient(16, 16)
    good = encode_jpeg(img)
    cases = [
        None,
        b"",
        b"abc",
        b"\xff\xd8\x00\x01\x02",          # bad marker structure
        good[: len(good) // 2],             # torn inside the tables
        good[:-40],                         # torn inside the entropy stream
        good.replace(b"\xff\xc0", b"\xff\xc2", 1),  # progressive: out of profile
        np.random.default_rng(0).integers(0, 256, 512, dtype=np.uint8).tobytes(),
    ]
    for buf in cases:
        assert decode_jpeg(buf) is None


def test_decode_image_jpeg_lane():
    from datasmith_spark.operators.multimodal import decode_image

    img = _gradient(24, 32)
    buf = encode_jpeg(img)
    out = decode_image(buf, 32, 24, "jpeg")
    assert out is not None and out.shape == (24, 32, 3)
    # metadata mismatch is flagged as undecodable, not silently resized
    assert decode_image(buf, 31, 24, "jpeg") is None
