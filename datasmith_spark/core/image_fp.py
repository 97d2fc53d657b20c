"""Perceptual image fingerprints (difference hash) — pure integer kernel.

dHash (Krawetz's difference hash, the public perceptual-hash family also
behind pHash/aHash): downscale the luma plane to a 9x8 grid of cell means
and keep only the SIGN of each horizontal neighbour difference — 8x8 = 64
bits that survive re-encoding, exposure/levels adjustment and mild noise,
because those perturb cell means far less than the between-cell contrast
that sets each bit.

Everything here is integer-exact (host-portable by construction, the same
discipline as core/audio_fp.py):

  * luma = 299*R + 587*G + 114*B (the ITU-R BT.601 weights scaled by 1000,
    kept as int64 sums — never divided),
  * the 9x8 downscale keeps (cell_sum, cell_pixel_count) pairs; cells are
    unequal when the image size doesn't divide 9/8, so the neighbour
    comparison is cross-multiplied: mean_a < mean_b  <=>
    sum_a * n_b < sum_b * n_a — exact rational compare, no float division,
  * bits are packed MSB-first row-major into four 16-bit bands (two grid
    rows per band) — the multi-index banding that makes near-dup candidate
    generation an exact-key equi-join (ids within Hamming distance d of
    each other share a clean band unless all four bands are hit, vanishing
    for the small d a true near-dup produces).

Reference ancestry: the reference dedups assets by exact content key
(/root/reference/src/datasmith/scrape/code_coverage.py:83-88); this is the
perceptual analogue for the image modality, mirroring what
core/audio_fp.py (Haitsma-Kalker) provides for audio.
"""

from __future__ import annotations

import numpy as np

# dHash grid: 9 luma columns x 8 rows -> 8x8 horizontal-difference bits.
DH_COLS = 9
DH_ROWS = 8
DH_BANDS = 4  # four 16-bit bands (two bit-rows each)
DH_MAX_HAMMING = 10  # default near-dup verify threshold (of 64 bits)


def luma_cells(img: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    """(cell luma sums int64 (8, 9), cell pixel counts int64 (8, 9)) for an
    HxWx3 uint8 image, or None if the image is too small for the grid.

    Cell k spans [k*H//8, (k+1)*H//8) rows (resp. W//9 cols) — the exact
    integer bucket boundaries both the distributed scan and the committed
    oracle fixture share, so the two sides cannot drift.
    """
    if img is None or img.ndim != 3 or img.shape[2] != 3:
        return None
    h, w = img.shape[:2]
    if h < DH_ROWS or w < DH_COLS:
        return None
    px = img.astype(np.int64)
    lum = 299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
    rb = (np.arange(DH_ROWS, dtype=np.int64) * h) // DH_ROWS
    cb = (np.arange(DH_COLS, dtype=np.int64) * w) // DH_COLS
    sums = np.add.reduceat(np.add.reduceat(lum, rb, axis=0), cb, axis=1)
    rn = np.diff(np.append(rb, h))
    cn = np.diff(np.append(cb, w))
    counts = rn[:, None] * cn[None, :]
    return sums, counts


def dhash_bands(img: np.ndarray) -> list[int] | None:
    """Four 16-bit dHash bands [b0..b3] (MSB-first row-major 64-bit hash
    split top rows first), or None if the image is too small.

    bit[r][c] = 1 iff cell mean (r, c) < cell mean (r, c+1), decided by the
    exact cross-multiplied compare (see module docstring).
    """
    cells = luma_cells(img)
    if cells is None:
        return None
    s, n = cells
    # mean[r, c] < mean[r, c+1]  <=>  s[r, c] * n[r, c+1] < s[r, c+1] * n[r, c]
    bits = (s[:, :-1] * n[:, 1:] < s[:, 1:] * n[:, :-1]).astype(np.int64)  # (8, 8)
    w16 = 1 << np.arange(15, -1, -1, dtype=np.int64)
    flat = bits.reshape(DH_BANDS, 16)
    return [int(v) for v in flat @ w16]


def hamming_bands(a: list[int], b: list[int]) -> int:
    """Hamming distance between two 4-band dHash values (0..64)."""
    return sum(int(x ^ y).bit_count() for x, y in zip(a, b))


def aug_exposure_variant(img: np.ndarray) -> np.ndarray:
    """Deterministic exposure/levels near-duplicate: gain 265/256 (~+3.5%)
    then brightness +4, clipped to uint8 — the image analogue of
    core/audio_fp.aug_variant's gain+requantization. Integer-exact
    ((px * 265) >> 8) + 4 so the planted ground truth is host-portable."""
    px = img.astype(np.int64)
    out = ((px * 265) >> 8) + 4
    return np.clip(out, 0, 255).astype(np.uint8)
