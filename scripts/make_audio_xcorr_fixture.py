"""Materialize the single-process planted-probe alignment oracle as a
committed parquet fixture (fixtures/oracle_audio_xcorr_n{N}.parquet) for
q156.

Per clip: plant d = 16 + crc32(clip_id) % 300 (id-hash, NEVER an index
parse), probe = zeros(d) ++ 0.6*pcm, recover d with the FFT
cross-correlator (core/spectral.xcorr_lag). Every output column is an
integer or boolean — the fixture is host-portable without any float-digest
contract (the argmax of a planted sharp peak is integer-stable).

Usage: python scripts/make_audio_xcorr_fixture.py [n_rows=4000]
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


def oracle_rows(indices) -> pd.DataFrame:
    from datasmith_spark import datagen
    from datasmith_spark.operators.audio_ops import ALIGN_MAX_LAG, _align_pdf

    return _align_pdf(datagen.gen_batch(list(indices)), ALIGN_MAX_LAG)


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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_xcorr_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(
        f"wrote {out}: {len(df)} rows, ok={int(df['ok'].sum())}, "
        f"hits={int(df['hit'].sum())}"
    )


if __name__ == "__main__":
    main()
