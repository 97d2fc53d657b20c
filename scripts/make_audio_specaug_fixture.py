"""Materialize the single-process SpecAugment oracle as a committed parquet
fixture (fixtures/oracle_audio_specaug_n{N}.parquet) for q57.

Same design as make_audio_cmvn_fixture.py; the mask geometry is a pure
integer function of md5(clip_id), so the fixture pins the augmentation
bit-for-bit with no RNG state to carry.

Usage: python scripts/make_audio_specaug_fixture.py [n_rows=4000]
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

N_FFT, HOP, N_MELS = 512, 256, 40


def oracle_rows(indices) -> pd.DataFrame:
    """SpecAugment oracle for clip rows `indices` — mirrors
    operators/audio_ops.py _specaug_pdf exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.resample import cmvn, logmel, spec_augment

    clips = datagen.gen_batch(indices)
    out = {"clip_id": [], "ok": [], "n_frames": [], "n_mels": [], "feats_md5": []}
    for row in clips.itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        out["clip_id"].append(row.clip_id)
        out["n_mels"].append(N_MELS)
        if pcm is None:
            out["ok"].append(False)
            out["n_frames"].append(0)
            a = np.zeros(0)
        else:
            m = spec_augment(
                cmvn(logmel(pcm, sr, n_fft=N_FFT, hop=HOP, n_mels=N_MELS)),
                str(row.clip_id),
            )
            out["ok"].append(True)
            out["n_frames"].append(m.shape[0])
            a = m.reshape(-1)
        out["feats_md5"].append(
            hashlib.md5(np.ascontiguousarray(a, dtype="<f8").tobytes()).hexdigest()
        )
    df = pd.DataFrame(out)
    df["n_frames"] = df["n_frames"].astype("int32")
    df["n_mels"] = df["n_mels"].astype("int32")
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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_specaug_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows, {int(df['ok'].sum())} augmented")


if __name__ == "__main__":
    main()
