"""Materialize the single-process pitch/voicing oracle as a committed
parquet fixture (fixtures/oracle_pitch_n{N}.parquet) for q164.

Same design as the other audio fixtures: the autocorrelation pitch stats
are a deterministic all-integer function of the pinned clips table (shared
core/pitch.py kernel — pocketfft autocorrelation, cross-multiplied voicing
compare, lower-median integer lag — independent driver loop here).

Usage: python scripts/make_pitch_fixture.py [n_rows=4000]
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
    """Pitch oracle for clip rows `indices` — mirrors
    operators/audio_ops._pitch_stats_pdf exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.pitch import pitch_stats

    out = {
        "clip_id": [], "ok": [], "n_frames": [], "n_voiced": [],
        "voiced_pct": [], "med_lag": [], "f0_hz": [],
    }
    for row in datagen.gen_batch(indices).itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        out["clip_id"].append(row.clip_id)
        if pcm is None or pcm.size == 0:
            out["ok"].append(False)
            for c in ("n_frames", "n_voiced", "voiced_pct", "med_lag", "f0_hz"):
                out[c].append(0)
            continue
        st = pitch_stats(pcm, sr)
        out["ok"].append(True)
        for c in ("n_frames", "n_voiced", "voiced_pct", "med_lag", "f0_hz"):
            out[c].append(st[c])
    df = pd.DataFrame(out)
    for c in ("n_frames", "n_voiced", "voiced_pct", "med_lag", "f0_hz"):
        df[c] = df[c].astype("int32")
    return df


def _chunk(args) -> pd.DataFrame:
    lo, hi = args
    return oracle_rows(range(lo, hi))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    chunks = [(lo, min(lo + 125, n)) for lo in range(0, n, 125)]
    with mp.get_context("fork").Pool(min(16, os.cpu_count() or 8)) as pool:
        parts = pool.map(_chunk, chunks)
    df = pd.concat(parts, ignore_index=True)
    assert len(df) == n
    out = os.path.join(FIXTURE_DIR, f"oracle_pitch_n{n}.parquet")
    df.to_parquet(out, index=False)
    voiced = df[df.ok & (df.voiced_pct > 0)]
    print(
        f"wrote {out}: {len(df)} rows, {int(df['ok'].sum())} decoded, "
        f"{len(voiced)} with voiced frames, f0 range "
        f"[{voiced.f0_hz.min() if len(voiced) else 0}, {voiced.f0_hz.max() if len(voiced) else 0}] Hz"
    )


if __name__ == "__main__":
    main()
