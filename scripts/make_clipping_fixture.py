"""Materialize the single-process clipping/saturation oracle as a committed
parquet fixture (fixtures/oracle_clipping_n{N}.parquet) for q171.

Same design as the other audio fixtures: the hard-clip audit is a
deterministic, host-portable function of the pinned clips table (shared
core/clipping.py kernel, independent driver loop here). Plants: every 40th
decodable non-silent clip also yields its cl_ variant (amplitude-relative
8x/16x power-of-two overdrive clamped to the codec's exact saturation
bounds).

Usage: python scripts/make_clipping_fixture.py [n_rows=4000]
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

AUG_EVERY = 40
COLS = (
    "n_samples", "n_clipped", "n_clip_runs", "max_clip_run",
    "clip_log2", "clipped", "keep",
)


def oracle_rows(indices) -> pd.DataFrame:
    """Clipping oracle for clip rows `indices` — mirrors
    operators/audio_ops._clipping_pdf(aug_every=40) exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.clipping import clipping_metrics, clipping_variant

    out = {c: [] for c in ("clip_id", "ok") + COLS}

    def _emit(cid, ok, m):
        out["clip_id"].append(cid)
        out["ok"].append(ok)
        for c in COLS:
            out[c].append(m[c])

    for row in datagen.gen_batch(indices).itertuples(index=False):
        i = int(row.clip_id.rsplit("_", 1)[1])
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        ok = pcm is not None and pcm.size > 0
        _emit(row.clip_id, ok, clipping_metrics(pcm if ok else None, row.codec))
        if i % AUG_EVERY == 0 and ok:
            y = clipping_variant(pcm, row.codec, row.clip_id)
            if y is not None:
                _emit(f"cl_{i:012d}", True, clipping_metrics(y, row.codec))
    df = pd.DataFrame(out)
    for c in ("n_samples", "n_clipped", "n_clip_runs", "max_clip_run"):
        df[c] = df[c].astype("int32")
    df["clip_log2"] = pd.array(df["clip_log2"], dtype="Int32")
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
    out = os.path.join(FIXTURE_DIR, f"oracle_clipping_n{n}.parquet")
    df.to_parquet(out, index=False)
    plants = df[df.clip_id.str.startswith("cl_")]
    base = df[~df.clip_id.str.startswith("cl_")]
    print(
        f"wrote {out}: {len(df)} rows; plants {len(plants)} "
        f"(clipped {int(plants.clipped.sum())}, min run "
        f"{int(plants.max_clip_run.min())}, min clip_log2 "
        f"{plants.clip_log2.min()}); base clipped {int(base.clipped.sum())}, "
        f"natural max run {int(base.max_clip_run.max())}, "
        f"natural clip_log2 max {base.clip_log2.max()}"
    )


if __name__ == "__main__":
    main()
