"""Materialize the single-process MFCC-front-end oracle as a committed
parquet fixture (fixtures/oracle_audio_mfcc_n{N}.parquet) for q160.

Same design as make_audio_ops_fixture.py: the MFCC+delta+delta2 digest is a
deterministic function of the pinned clips table (shared logmel/DCT/delta
kernels, independent driver loop). Portability: the mel and DCT projections
use numpy's fixed pairwise summation over pinned axes (no BLAS), the delta
numerator accumulates in fixed d order, and divide is IEEE correctly
rounded — so the fixture reproduces bit-for-bit across hosts.

Usage: python scripts/make_audio_mfcc_fixture.py [n_rows=4000]
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

N_FFT, HOP, N_MELS, N_MFCC = 512, 256, 40, 13


def oracle_rows(indices) -> pd.DataFrame:
    """MFCC oracle for clip rows `indices` — mirrors
    operators/audio_ops.py _mfcc_pdf exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.resample import mfcc

    clips = datagen.gen_batch(indices)
    out = {"clip_id": [], "ok": [], "n_frames": [], "n_coef": [], "feats_md5": []}
    for row in clips.itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        out["clip_id"].append(row.clip_id)
        out["n_coef"].append(3 * N_MFCC)
        if pcm is None:
            out["ok"].append(False)
            out["n_frames"].append(0)
            a = np.zeros(0)
        else:
            m = mfcc(pcm, sr, n_fft=N_FFT, hop=HOP, n_mels=N_MELS, n_mfcc=N_MFCC)
            out["ok"].append(True)
            out["n_frames"].append(m.shape[0])
            a = m.reshape(-1)
        out["feats_md5"].append(
            hashlib.md5(np.ascontiguousarray(a, dtype="<f8").tobytes()).hexdigest()
        )
    df = pd.DataFrame(out)
    df["n_frames"] = df["n_frames"].astype("int32")
    df["n_coef"] = df["n_coef"].astype("int32")
    return df


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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_mfcc_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows, {int(df['ok'].sum())} featurized")


if __name__ == "__main__":
    main()
