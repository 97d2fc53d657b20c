"""Materialize the single-process tonal-signature oracle as a committed
parquet fixture (fixtures/oracle_audio_sig_n{N}.parquet) for q159's
speed/pitch-shift-robust near-dup lane.

Records each pinned-subset clip's tonal peak-bin array
(core/specsig.tone_peaks16 over the decode -> 16 kHz head) via an
independent driver loop over the shared kernel, INCLUDING the planted
speed variants (core/specsig.speed_variant16: id-hashed Kaldi sp factor
from {9/10, 19/20, 21/20, 11/10}, gain 0.8, pcm16 requant) under sp_ ids.
The driver's DuckDB oracle then re-derives the ENTIRE distributed match —
ratio-key melt with +-1 expansion, the shared capped pair CTE, and the
integer rate-hypothesis verify via list lambdas — in SQL over these
arrays, while the Spark query recomputes the signatures distributed and
evaluates the same verify with native higher-order functions.

Usage: python scripts/make_audio_sig_fixture.py [n_rows=4000]
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
    """(clip_id, peaks, k) oracle rows for clip indices — mirrors
    operators/specsig._sig_rows exactly (shared kernels, independent
    driver loop)."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.specsig import speed_variant16, tone_peaks16
    from datasmith_spark.operators.landmark import _head16
    from datasmith_spark.operators.specsig import SS_AUG_EVERY, SS_EVERY

    ids: list[str] = []
    pk: list[list[int]] = []
    for row in datagen.gen_batch(indices).itertuples(index=False):
        i = int(row.clip_id.rsplit("_", 1)[1])
        if SS_EVERY > 1 and i % SS_EVERY:
            continue
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        if not sr or sr <= 0:
            continue
        pcm = decode(row.bytes, row.codec)
        if pcm is None or pcm.size == 0:
            continue
        x16 = _head16(pcm, sr)
        ids.append(row.clip_id)
        pk.append(tone_peaks16(x16))
        if SS_AUG_EVERY and i % SS_AUG_EVERY == 0:
            ids.append(f"sp_{i:012d}")
            pk.append(tone_peaks16(speed_variant16(x16, row.clip_id)))
    return pd.DataFrame(
        {"clip_id": ids, "peaks": pk, "k": pd.array([len(p) for p in pk], dtype="int32")}
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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_sig_n{n}.parquet")
    df.to_parquet(out, index=False)
    sp = df.clip_id.str.startswith("sp_")
    in_scope = (df.k >= 2) & (df.k <= 5)
    print(
        f"wrote {out}: {len(df)} signature rows ({int(sp.sum())} sp_ plants, "
        f"{int(in_scope.sum())} in matching scope 2..5)"
    )


if __name__ == "__main__":
    main()
