"""Materialize the single-process image-dHash oracle as a committed parquet
fixture (fixtures/oracle_image_fp_n{N}.parquet) for q65.

Why: the dHash kernel decodes images through the pure-python codecs, which
DuckDB cannot re-express — but the hash is a deterministic integer function
of the pinned synthetic image table, so a single-process pass records the
exact (img_id, b0..b3) band values (base rows + the planted imgaug_
exposure variants). The driver's DuckDB oracle then re-derives the ENTIRE
downstream computation in SQL — band melt, hot-key cap, candidate pair
join, and the 64-bit Hamming verify via bit_count(xor(...)) — while the
Spark query recomputes the hashes distributed and runs the production
operators. Any drift in decode, luma bucketing, the cross-multiplied
compare, banding, the cap, or the verify flips the value hash.

Portability: every value is an integer (int64 luma sums, cross-multiplied
compares) — bit-exact across hosts by construction; tests regenerate a
sample and assert equality against the committed fixture.

Usage: python scripts/make_image_fp_fixture.py [n_rows=4000]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

WIDTH, HEIGHT = 32, 24  # synth_images defaults — the pinned q65 table shape


def oracle_rows(indices) -> pd.DataFrame:
    """dHash oracle for rows `indices` — regenerates each payload via the
    shared synth_image_record rules, then hashes (and plants the exposure
    variants) through the shared kernel (independent driver loop, no
    Spark)."""
    from datasmith_spark.operators.image_fp import IMG_AUG_EVERY, _hash_rows
    from datasmith_spark.operators.multimodal import synth_image_record

    return _hash_rows(
        pd.DataFrame([synth_image_record(i, WIDTH, HEIGHT) for i in indices]),
        aug_every=IMG_AUG_EVERY,
    )


def _chunk(args) -> pd.DataFrame:
    lo, hi = args
    return oracle_rows(range(lo, hi))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    chunks = [(lo, min(lo + 125, n)) for lo in range(0, n, 125)]
    procs = min(16, os.cpu_count() or 8)
    with mp.get_context("fork").Pool(procs) as pool:
        parts = pool.map(_chunk, chunks)
    df = pd.concat(parts, ignore_index=True)
    n_aug = int(df["img_id"].str.startswith("imgaug_").sum())
    out = os.path.join(FIXTURE_DIR, f"oracle_image_fp_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows ({n_aug} planted imgaug_ variants)")


if __name__ == "__main__":
    main()
