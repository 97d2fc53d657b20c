"""Materialize the single-process audio-fingerprint oracle as a committed
parquet fixture (fixtures/oracle_audio_fp_n{N}.parquet) for q38.

Why: the Haitsma-Kalker fingerprint (decode -> resample to 16 kHz -> 17-band
log-mel -> sign-of-ddE bits -> 4-gram keys) is a numeric kernel DuckDB cannot
re-express, but it is a deterministic function of the pinned clips table
(seed=42, row index). This script records each clip's distinct key set via an
independent driver loop over the SHARED portable kernels (core/audio_fp.py,
fixed-order summation only); the driver's DuckDB oracle then re-derives the
entire distributed part — capped candidate-pair generation and the
integer-exact Jaccard verify — in SQL over these keys, while the Spark query
recomputes the keys distributed AND runs the real joins. Any bit difference
in decode/resample/logmel/bit-packing changes a key and breaks the
value-hash; any semantic drift in the pair join breaks it too (same split as
q34: kernel via fixture, join semantics re-derived in SQL).

Includes the planted augmented near-duplicates (core/audio_fp.aug_variant:
gain 0.8 + pcm16 requantization) under `aug_` ids — the ground truth the
pair query must recover.

Usage: python scripts/make_audio_fp_fixture.py [n_rows=4000]
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
    """(clip_id, fp_key) oracle rows for clip indices — mirrors the
    semantics of operators/audio_fp._fp_rows exactly (shared kernels,
    independent driver loop): only decodable positive-rate clips yield
    keys; every FP_AUG_EVERY-th also yields keys for its aug variant."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.audio_fp import FP_MAX_S, aug_variant, fp_keys
    from datasmith_spark.operators.audio_fp import FP_AUG_EVERY, FP_EVERY

    ids: list[str] = []
    keys: list[str] = []
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
        ks = fp_keys(pcm, sr)
        ids.extend([row.clip_id] * len(ks))
        keys.extend(ks)
        if FP_AUG_EVERY and i % FP_AUG_EVERY == 0:
            ks2 = fp_keys(aug_variant(pcm[: int(round(FP_MAX_S * sr))]), sr)
            ids.extend([f"aug_{i:012d}"] * len(ks2))
            keys.extend(ks2)
    return pd.DataFrame({"clip_id": ids, "fp_key": keys})


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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_fp_n{n}.parquet")
    df.to_parquet(out, index=False)
    n_aug = df.clip_id.str.startswith("aug_").sum()
    print(
        f"wrote {out}: {len(df)} key rows, {df.clip_id.nunique()} clips "
        f"({df[df.clip_id.str.startswith('aug_')].clip_id.nunique()} augs, {n_aug} aug rows)"
    )


if __name__ == "__main__":
    main()
