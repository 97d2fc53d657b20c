"""Materialize the single-process ROBUST-lane audio-fingerprint oracle as a
committed parquet fixture (fixtures/oracle_audio_fp_ball_n{N}.parquet) for
q40.

Same split-oracle design as make_audio_fp_fixture.py (q38): the fingerprint
kernel (decode -> 16 kHz sinc resample -> 17-band log-mel -> sign-of-ddE
bits) is a deterministic numeric function of the pinned clips table that
DuckDB cannot re-express, so this script records each clip's distinct
integer 2-gram keys via an independent driver loop over the SHARED portable
kernels. The driver's DuckDB oracle then re-derives the ENTIRE distributed
part in SQL — the radius-1 Hamming-ball expansion (33-mask xor() explode),
the capped candidate self-join, and the symmetric integer hit-ratio verify
— while the Spark query recomputes the keys distributed and runs the real
joins. The ball never touches the fixture: both engines expand the same
exact keys with the same XOR masks.

Plants mu-law-companded near-duplicates (core/audio_fp.aug_mulaw_variant:
gain 0.9 + 8-bit mu-law round-trip) under `mul_` ids — the coarse-re-encode
class q38's exact-key lane documents as out of reach, and the ground truth
q40 must recover.

Usage: python scripts/make_audio_fp_ball_fixture.py [n_rows=4000]
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
    """(clip_id, fp_ikey) oracle rows for clip indices — mirrors
    operators/audio_fp._fp_irows exactly (shared kernels, independent
    driver loop)."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.audio_fp import FP_MAX_S, aug_mulaw_variant, fp_int_keys
    from datasmith_spark.operators.audio_fp import FP_AUG_EVERY, FP_EVERY

    ids: list[str] = []
    keys: list[int] = []
    for row in datagen.gen_batch(indices).itertuples(index=False):
        i = int(row.clip_id.rsplit("_", 1)[1])
        if FP_EVERY > 1 and i % FP_EVERY:
            continue
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        if not sr or sr <= 0:
            continue
        pcm = decode(row.bytes, row.codec)
        if pcm is None or pcm.size == 0:
            continue
        ks = fp_int_keys(pcm, sr)
        ids.extend([row.clip_id] * len(ks))
        keys.extend(ks)
        if FP_AUG_EVERY and i % FP_AUG_EVERY == 0:
            ks2 = fp_int_keys(aug_mulaw_variant(pcm[: int(round(FP_MAX_S * sr))]), sr)
            ids.extend([f"mul_{i:012d}"] * len(ks2))
            keys.extend(ks2)
    return pd.DataFrame({"clip_id": ids, "fp_ikey": pd.array(keys, dtype="int64")})


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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_fp_ball_n{n}.parquet")
    df.to_parquet(out, index=False)
    n_mul = df.clip_id.str.startswith("mul_").sum()
    print(
        f"wrote {out}: {len(df)} key rows, {df.clip_id.nunique()} clips "
        f"({df[df.clip_id.str.startswith('mul_')].clip_id.nunique()} mulaw plants, {n_mul} rows)"
    )


if __name__ == "__main__":
    main()
