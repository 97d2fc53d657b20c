"""Materialize the single-process pitch-shift oracle as a committed parquet
fixture (fixtures/oracle_audio_pitch_n{N}.parquet) for q84. Same design as
make_audio_tempo_fixture.py; the composition (Lanczos resample + WSOLA) is
host-portable because the only ulp-flippable decision — the WSOLA alignment
argmax — is an exact int64 cross-correlation, and the resample stage is a
fixed-order sinc sum.

Usage: python scripts/make_audio_pitch_fixture.py [n_rows=4000]
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

CODEC_OUT = "pcm16"


def oracle_rows(indices) -> pd.DataFrame:
    """Pitch oracle for clip rows `indices` — mirrors
    operators/audio_ops.py _pitch_pdf exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode, encode
    from datasmith_spark.core.resample import pitch_shift
    from datasmith_spark.operators.audio_ops import PITCH_FACTORS

    clips = datagen.gen_batch(indices)
    out = {
        "clip_id": [], "f_num": [], "f_den": [], "ps_ok": [],
        "sr_hz": [], "dur_ms": [], "payload_md5": [],
    }
    for row in clips.itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        for num, den in PITCH_FACTORS:
            y = pitch_shift(pcm, num, den) if pcm is not None else None
            out["clip_id"].append(row.clip_id)
            out["f_num"].append(num)
            out["f_den"].append(den)
            out["sr_hz"].append(sr)
            if y is None:
                out["ps_ok"].append(False)
                out["dur_ms"].append(
                    None if pd.isna(row.dur_ms) else int(row.dur_ms)
                )
                buf = row.bytes
            else:
                out["ps_ok"].append(True)
                out["dur_ms"].append(int(y.size * 1000) // int(sr))
                buf = encode(y, CODEC_OUT)
            out["payload_md5"].append(
                None if buf is None else hashlib.md5(buf).hexdigest()
            )
    df = pd.DataFrame(out)
    df["f_num"] = df["f_num"].astype("int32")
    df["f_den"] = df["f_den"].astype("int32")
    df["sr_hz"] = df["sr_hz"].astype("Int32")
    df["dur_ms"] = df["dur_ms"].astype("Int32")
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
    assert len(df) == 2 * n
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_pitch_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows, {int(df['ps_ok'].sum())} shifted")


if __name__ == "__main__":
    main()
