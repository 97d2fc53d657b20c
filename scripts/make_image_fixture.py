"""Materialize the single-process image-decode oracle as a committed parquet
fixture (fixtures/oracle_images_n{N}.parquet) for q39.

Why: decode_png / decode_jpeg run codec kernels DuckDB cannot re-express —
but their outputs are deterministic functions of the pinned synthetic image
table (seeded per row index), so a single-process pass records a bit-exact
digest per image (md5 of the decoded HxWx3 uint8 buffer) that the driver's
DuckDB oracle reads back while the Spark query recomputes the same digests
distributed. Any bit difference in PNG unfiltering, JPEG entropy decode,
IDCT, or upsampling flips the hash, so the driver's value-hash check
verifies the full codec + Arrow plumbing end to end (same design as
make_audio_ops_fixture.py for q36/q37).

Portability: the digest is over uint8 pixels — pure integer pipelines in
both codecs (the JPEG IDCT rounds through the same fixed numpy expression
everywhere), so the fixture reproduces bit-for-bit across hosts;
tests/test_webscale.py regenerates a sample and asserts equality.

Usage: python scripts/make_image_fixture.py [n_rows=4000]
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

WIDTH, HEIGHT = 32, 24  # synth_images defaults — the pinned q39 table shape


def oracle_rows(indices) -> pd.DataFrame:
    """Image-decode oracle for rows `indices` — regenerates each payload via
    the shared synth_image_record rules, then decodes and digests through the
    shared codecs (independent driver loop, no Spark)."""
    from datasmith_spark.operators.multimodal import _image_digest_pdf, synth_image_record

    return _image_digest_pdf(
        pd.DataFrame([synth_image_record(i, WIDTH, HEIGHT) for i in indices])
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
    assert len(df) == n
    by_fmt = df.groupby("fmt")["decode_ok"].agg(["count", "sum"])
    out = os.path.join(FIXTURE_DIR, f"oracle_images_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows\n{by_fmt}")


if __name__ == "__main__":
    main()
