"""Materialize the single-process NOISE-lane landmark oracle as a committed
parquet fixture (fixtures/oracle_audio_lmnz_n{N}.parquet) for q161.

Same split-oracle design as make_audio_lm_fixture.py: this script records
each clip's (lm_hash, t) landmark set via an independent driver loop over
the SHARED portable kernels (core/landmark.py, core/resample.add_noise);
the driver's DuckDB oracle re-derives the entire distributed match in SQL
over these keys while the Spark query recomputes the keys distributed AND
runs the real joins.

Plants: every LM_AUG_EVERY-th subset clip also yields its NOISY nz_
variant (core/landmark.noisy_variant16: additive white noise at exactly
30 dB SNR — counter-based Philox keyed by the clip id — gain 0.6, pcm16
requantization), the hiss-floor re-encode duplicate class. On the pinned
corpus all 97 plants pass the unchanged q157 verdict with >= 146 pooled
votes and >= 12.1x dominance; zero false pairs (measured — see
core/landmark.noisy_variant16 for the 20 dB collapse envelope).

Usage: python scripts/make_audio_lmnz_fixture.py [n_rows=4000]
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
    """(clip_id, lm_hash, t) oracle rows for clip indices — mirrors
    operators/landmark._lm_noise_rows exactly (shared kernels, independent
    driver loop)."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.landmark import landmark_hashes16, noisy_variant16
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
            y = noisy_variant16(x16, row.clip_id)
            if y is None:
                continue
            for h, t in landmark_hashes16(y):
                ids.append(f"nz_{i:012d}")
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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_lmnz_n{n}.parquet")
    df.to_parquet(out, index=False)
    n_plants = df[df.clip_id.str.startswith("nz_")].clip_id.nunique()
    print(f"wrote {out}: {len(df)} key rows, {df.clip_id.nunique()} ids, {n_plants} noisy plants")


if __name__ == "__main__":
    main()
