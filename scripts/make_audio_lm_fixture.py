"""Materialize the single-process constellation-landmark oracle as a
committed parquet fixture (fixtures/oracle_audio_lm_n{N}.parquet) for q157.

Why: the landmark kernel (decode -> 16 kHz sinc resample -> Hann power
spectrogram -> strict-local-max peaks -> (f1,f2,dt) pair hashes) is a
numeric kernel DuckDB cannot re-express, but it is a deterministic function
of the pinned clips table (seed=42, row index). This script records each
clip's (lm_hash, t) landmark set via an independent driver loop over the
SHARED portable kernel (core/landmark.py); the driver's DuckDB oracle then
re-derives the entire distributed part — stop-hash filtering, the hash
self-join, the offset vote, and the top-1-per-pair verdict — in SQL over
these keys, while the Spark query recomputes the keys distributed AND runs
the real joins. Any bit difference in decode/resample/FFT/peak-picking
changes a key and breaks the value-hash; any semantic drift in the match
stage breaks it too (the q38 split-oracle design).

Includes the planted DELAYED near-duplicates (core/landmark.delayed_variant16:
16 + crc32(id) % 1200 SAMPLE delay — every sub-hop phase — gain 0.6, pcm16
requantization) under del_ ids — the shifted ground truth the frame-aligned lanes (q38/q40) cannot
recover and the landmark match must.

Usage: python scripts/make_audio_lm_fixture.py [n_rows=4000]
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
    """(clip_id, lm_hash, t) oracle rows for clip indices — mirrors the
    semantics of operators/landmark._lm_rows exactly (shared kernels,
    independent driver loop): only decodable positive-rate clips yield
    landmarks; every LM_AUG_EVERY-th also yields its delayed del_ variant."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.landmark import (
        delayed_variant16,
        landmark_hashes16,
        plant_delay,
    )
    from datasmith_spark.operators.landmark import LM_AUG_EVERY, LM_EVERY, _head16

    ids: list[str] = []
    hs: list[int] = []
    ts: list[int] = []
    for row in datagen.gen_batch(indices).itertuples(index=False):
        i = int(row.clip_id.rsplit("_", 1)[1])
        if LM_EVERY > 1 and i % LM_EVERY:
            continue
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        if not sr or sr <= 0:
            continue
        pcm = decode(row.bytes, row.codec)
        if pcm is None or pcm.size == 0:
            continue
        x16 = _head16(pcm, sr)
        for h, t in landmark_hashes16(x16):
            ids.append(row.clip_id)
            hs.append(h)
            ts.append(t)
        if LM_AUG_EVERY and i % LM_AUG_EVERY == 0:
            d = plant_delay(row.clip_id)
            for h, t in landmark_hashes16(delayed_variant16(x16, d)):
                ids.append(f"del_{i:012d}")
                hs.append(h)
                ts.append(t)
    return pd.DataFrame(
        {
            "clip_id": ids,
            "lm_hash": pd.array(hs, dtype="int64"),
            "t": pd.array(ts, dtype="int32"),
        }
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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_lm_n{n}.parquet")
    df.to_parquet(out, index=False)
    dels = df.clip_id.str.startswith("del_")
    print(
        f"wrote {out}: {len(df)} landmark rows, {df.clip_id.nunique()} clips "
        f"({df[dels].clip_id.nunique()} planted del_ dups, {int(dels.sum())} del rows)"
    )


if __name__ == "__main__":
    main()
