"""Materialize the single-process transcript-compressibility oracle as a
committed parquet fixture (fixtures/oracle_compress_n{N}.parquet) for q163.

Same design as the audio fixtures: (raw_len, comp_len) and the integer band
verdict are deterministic functions of the pinned clips table (seed=42, row
index) — zlib level-6 output is stable across builds — recorded here by an
independent driver loop over the SHARED kernel (core/text.compress_metrics
/ compress_keep) while the Spark query recomputes them distributed.

Usage: python scripts/make_compress_fixture.py [n_rows=4000]
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
    """Compressibility oracle for clip rows `indices` — mirrors
    operators/text_analysis.transcript_compressibility exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.text import compress_keep, compress_metrics

    out = {
        "clip_id": [], "raw_len": [], "comp_len": [],
        "too_repetitive": [], "too_random": [], "keep": [],
    }
    for row in datagen.gen_batch(indices).itertuples(index=False):
        t = row.transcript
        raw, comp = compress_metrics(None if pd.isna(t) else str(t))
        rep, rnd, keep = compress_keep(raw, comp)
        out["clip_id"].append(row.clip_id)
        out["raw_len"].append(raw)
        out["comp_len"].append(comp)
        out["too_repetitive"].append(rep)
        out["too_random"].append(rnd)
        out["keep"].append(keep)
    df = pd.DataFrame(out)
    df["raw_len"] = df["raw_len"].astype("int32")
    df["comp_len"] = df["comp_len"].astype("int32")
    return df


def _chunk(args) -> pd.DataFrame:
    lo, hi = args
    return oracle_rows(range(lo, hi))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    chunks = [(lo, min(lo + 250, n)) for lo in range(0, n, 250)]
    with mp.get_context("fork").Pool(min(16, os.cpu_count() or 8)) as pool:
        parts = pool.map(_chunk, chunks)
    df = pd.concat(parts, ignore_index=True)
    assert len(df) == n
    out = os.path.join(FIXTURE_DIR, f"oracle_compress_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(
        f"wrote {out}: {len(df)} rows, keep={int(df['keep'].sum())}, "
        f"rep={int(df['too_repetitive'].sum())}, rnd={int(df['too_random'].sum())}"
    )


if __name__ == "__main__":
    main()
