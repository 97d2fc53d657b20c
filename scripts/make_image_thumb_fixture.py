"""Materialize the single-process thumbnail-digest oracle as a committed
parquet fixture (fixtures/oracle_image_thumb_n{N}.parquet) for q79.

Same design as make_image_fixture.py (q39): the shared codecs decode each
pinned synthetic image, the shared nearest-neighbor resize produces the
16x12 thumbnail, and the md5 of the resized uint8 buffer is recorded. Pure
integer end to end — host-portable by construction; the fixture-honesty
pytest regenerates a sample.

Usage: python scripts/make_image_thumb_fixture.py [n_rows=4000]
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

WIDTH, HEIGHT = 32, 24  # synth_images defaults


def oracle_rows(indices) -> pd.DataFrame:
    from datasmith_spark.operators.multimodal import _thumb_pdf, synth_image_record

    return _thumb_pdf(
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
    out = os.path.join(FIXTURE_DIR, f"oracle_image_thumb_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows, {int(df['thumb_ok'].sum())} ok")


if __name__ == "__main__":
    main()
