"""Materialize the single-process oracle's labels + decode features as a
committed parquet fixture (fixtures/oracle_labels_n{N}.parquet).

Why: q27/q28 run the full UDF pipeline, which DuckDB cannot re-express — but
the independent single-process oracle (datasmith_spark/oracle.py) CAN be run
ahead of time and its output aggregated by DuckDB. Committing the oracle's
output as a deterministic fixture turns the driver's rows-only check into a
real value-hash check while keeping the oracle implementation independent of
the Spark code path (ref ancestry: the reference's replication-experiment
oracle idea, /root/reference/README.md:223-232).

Everything is a pure function of seed=42 and the row index, so the fixture
is reproducible bit-for-bit in content; tests/test_pipeline.py spot-checks a
sample of rows against a fresh regeneration.

Usage: python scripts/make_oracle_fixture.py [n_rows=4000] [n_parts=32]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

FEATURE_COLS = ["n_samples", "rms", "peak", "clip_rate", "finite_frac", "decode_ok"]


def oracle_rows(indices) -> pd.DataFrame:
    """Oracle labels + decode features for clip rows `indices`.

    Decode features mirror the Spark pipeline's semantics exactly: rows
    dropped at the rules stage never reach decode -> null features; all
    other rows carry audio.pcm_features of the decoded PCM.
    """
    from datasmith_spark import datagen, oracle
    from datasmith_spark.core import audio, rules

    clips = datagen.gen_batch(indices)
    labels = oracle.oracle_labels(clips, n_parts=N_PARTS)
    feats: dict[str, list] = {c: [] for c in FEATURE_COLS}
    for row in clips.itertuples(index=False):
        if rules.rule_reasons(
            row.codec, int(row.sr_hz), int(row.dur_ms),
            len(row.bytes) if row.bytes is not None else None, row.transcript,
        ):
            for c in FEATURE_COLS:
                feats[c].append(None)
            continue
        pcm = audio.decode(row.bytes, row.codec)
        ns, rms, peak, clip, fin = audio.pcm_features(pcm)
        feats["n_samples"].append(int(ns))
        feats["rms"].append(float(rms))
        feats["peak"].append(float(peak))
        feats["clip_rate"].append(float(clip))
        feats["finite_frac"].append(float(fin))
        feats["decode_ok"].append(pcm is not None)
    for c in FEATURE_COLS:
        labels[c] = feats[c]
    labels["n_samples"] = labels["n_samples"].astype("Int64")
    labels["decode_ok"] = labels["decode_ok"].astype("boolean")
    return labels


N_PARTS = 32


def _chunk(args) -> pd.DataFrame:
    lo, hi = args
    return oracle_rows(range(lo, hi))


def main() -> None:
    global N_PARTS
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    N_PARTS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    chunks = [(lo, min(lo + 125, n)) for lo in range(0, n, 125)]
    procs = min(16, os.cpu_count() or 8)
    with mp.get_context("fork").Pool(procs) as pool:
        parts = pool.map(_chunk, chunks)
    df = pd.concat(parts, ignore_index=True)
    assert len(df) == n
    # deterministic dtypes for a stable value-hash on the DuckDB side
    df["pii_count"] = df["pii_count"].astype("Int32")
    df["tox_count"] = df["tox_count"].astype("Int32")
    out = os.path.join(FIXTURE_DIR, f"oracle_labels_n{n}.parquet")
    df.to_parquet(out, index=False)
    kept = int(df["keep"].sum())
    print(f"wrote {out}: {len(df)} rows, {kept} keep, "
          f"{int(df['decode_ok'].notna().sum())} decoded")


if __name__ == "__main__":
    main()
