"""Materialize the single-process peak-normalization oracle as a committed
parquet fixture (fixtures/oracle_audio_norm_n{N}.parquet) for q50.

Same design as make_audio_vad_fixture.py: the normalized payload digest is a
deterministic function of the pinned clips table that DuckDB cannot
re-derive, so a single-process pass records it (shared kernel, independent
driver loop). Host-portability: the target peak is an exact binary fraction
(57/64) and the gain path is one IEEE division + one multiply per sample —
no libm transcendentals; tests/test_spectral.py regenerates a sample and
asserts equality.

Usage: python scripts/make_audio_norm_fixture.py [n_rows=4000]
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)


def oracle_rows(indices) -> pd.DataFrame:
    """Normalization oracle for clip rows `indices` — mirrors
    operators/audio_ops.py _normalize_pdf exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode, encode
    from datasmith_spark.operators.audio_ops import NORM_TARGET_PEAK

    clips = datagen.gen_batch(indices)
    out = {"clip_id": [], "normalized": [], "payload_md5": []}
    for row in clips.itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        buf = row.bytes
        normalized = False
        if pcm is not None:
            peak = float(np.max(np.abs(pcm)))
            if peak > 0.0:
                buf = encode(pcm * (NORM_TARGET_PEAK / peak), row.codec)
                normalized = True
        out["clip_id"].append(row.clip_id)
        out["normalized"].append(normalized)
        out["payload_md5"].append(
            None if buf is None else hashlib.md5(buf).hexdigest()
        )
    return pd.DataFrame(out)


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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_norm_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(
        f"wrote {out}: {len(df)} rows, {int(df['normalized'].sum())} normalized"
    )


if __name__ == "__main__":
    main()
