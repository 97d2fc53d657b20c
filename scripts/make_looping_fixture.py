"""Materialize the single-process looped-content oracle as a committed
parquet fixture (fixtures/oracle_looping_n{N}.parquet) for q173.

Same design as the other audio fixtures: the tiling audit is a
deterministic, host-portable function of the pinned clips table (shared
core/looping.py kernel, independent driver loop here). Plants: every 40th
decodable clip also yields its lp_ variant (leading n//k segment tiled an
id-hashed k in {2,3,4} times).

Usage: python scripts/make_looping_fixture.py [n_rows=4000]
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
COLS = ("n_samples", "loop_k", "loop_period", "looped", "keep")


def oracle_rows(indices) -> pd.DataFrame:
    """Looping oracle for clip rows `indices` — mirrors
    operators/audio_ops._looping_pdf(aug_every=40) exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.looping import looping_metrics, looping_variant

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
        _emit(row.clip_id, ok, looping_metrics(pcm if ok else None))
        if i % AUG_EVERY == 0 and ok:
            y = looping_variant(pcm, row.clip_id)
            if y is not None:
                _emit(f"lp_{i:012d}", True, looping_metrics(y))
    df = pd.DataFrame(out)
    for c in ("n_samples", "loop_k"):
        df[c] = df[c].astype("int32")
    df["loop_period"] = pd.array(df["loop_period"], dtype="Int32")
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
    out = os.path.join(FIXTURE_DIR, f"oracle_looping_n{n}.parquet")
    df.to_parquet(out, index=False)
    plants = df[df.clip_id.str.startswith("lp_")]
    base = df[~df.clip_id.str.startswith("lp_")]
    print(
        f"wrote {out}: {len(df)} rows; plants {len(plants)} "
        f"(looped {int(plants.looped.sum())}, ks "
        f"{sorted(plants.loop_k.unique().tolist())}); "
        f"base looped {int(base.looped.sum())}"
    )


if __name__ == "__main__":
    main()
