"""Materialize the single-process effective-bit-depth oracle as a committed
parquet fixture (fixtures/oracle_bitdepth_n{N}.parquet) for q172.

Same design as the other audio fixtures: the bit-crush audit is a
deterministic, host-portable function of the pinned clips table (shared
core/bitdepth.py kernel, independent driver loop here). Plants: every 40th
decodable linear-codec clip also yields its bd_ variant (id-hashed 6/4-bit
power-of-two re-quantization).

Usage: python scripts/make_bitdepth_fixture.py [n_rows=4000]
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
COLS = ("n_nonzero", "grid_gcd", "eff_bits", "nominal_bits", "depth_fraud", "keep")


def oracle_rows(indices) -> pd.DataFrame:
    """Bit-depth oracle for clip rows `indices` — mirrors
    operators/audio_ops._bitdepth_pdf(aug_every=40) exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.bitdepth import bitdepth_metrics, bitdepth_variant

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
        _emit(row.clip_id, ok, bitdepth_metrics(pcm if ok else None, row.codec))
        if i % AUG_EVERY == 0 and ok:
            y = bitdepth_variant(pcm, row.codec, row.clip_id)
            if y is not None:
                _emit(f"bd_{i:012d}", True, bitdepth_metrics(y, row.codec))
    df = pd.DataFrame(out)
    df["n_nonzero"] = df["n_nonzero"].astype("int32")
    df["grid_gcd"] = pd.array(df["grid_gcd"], dtype="Int64")
    for c in ("eff_bits", "nominal_bits"):
        df[c] = pd.array(df[c], dtype="Int32")
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
    out = os.path.join(FIXTURE_DIR, f"oracle_bitdepth_n{n}.parquet")
    df.to_parquet(out, index=False)
    plants = df[df.clip_id.str.startswith("bd_")]
    base = df[~df.clip_id.str.startswith("bd_")]
    judged = base[base.eff_bits.notna()]
    print(
        f"wrote {out}: {len(df)} rows; plants {len(plants)} "
        f"(fraud {int(plants.depth_fraud.sum())}, eff_bits "
        f"{sorted(plants.eff_bits.dropna().unique().tolist())}); "
        f"base fraud {int(base.depth_fraud.sum())}, judged {len(judged)}, "
        f"natural deficit max "
        f"{int((judged.nominal_bits - judged.eff_bits).max())}"
    )


if __name__ == "__main__":
    main()
