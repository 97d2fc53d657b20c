"""Materialize the single-process electrical-defect oracle as a committed
parquet fixture (fixtures/oracle_electrical_n{N}.parquet) for q170.

Same design as the other audio fixtures: the mains-hum / DC-offset audit
is a deterministic, host-portable function of the pinned clips table
(shared core/electrical.py kernel, independent driver loop here). Plants:
every 40th decodable clip of >= 400 ms also yields its el_ variant (an
id-hashed 50/60 Hz square hum at rms/2 plus a DC offset of rms/8).

Usage: python scripts/make_electrical_fixture.py [n_rows=4000]
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
COLS = ("n_frames", "hum_log2", "hum", "dc_log2", "dc", "keep")


def oracle_rows(indices) -> pd.DataFrame:
    """Electrical oracle for clip rows `indices` — mirrors
    operators/audio_ops._electrical_pdf(aug_every=40) exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.electrical import electrical_metrics, electrical_variant
    from datasmith_spark.operators.audio_ops import ELEC_AUG_MIN_MS

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
        _emit(row.clip_id, ok, electrical_metrics(pcm if ok else None, sr))
        if i % AUG_EVERY == 0 and ok and pcm.size * 1000 >= ELEC_AUG_MIN_MS * sr:
            y = electrical_variant(pcm, sr, row.clip_id)
            if y is not None:
                _emit(f"el_{i:012d}", True, electrical_metrics(y, sr))
    df = pd.DataFrame(out)
    for c in ("n_frames", "hum_log2", "dc_log2"):
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
    out = os.path.join(FIXTURE_DIR, f"oracle_electrical_n{n}.parquet")
    df.to_parquet(out, index=False)
    plants = df[df.clip_id.str.startswith("el_")]
    base = df[~df.clip_id.str.startswith("el_")]
    print(
        f"wrote {out}: {len(df)} rows; plants {len(plants)} "
        f"(hum+dc flagged {int((plants.hum & plants.dc).sum())}); "
        f"base hum {int(base.hum.sum())}, base dc {int(base.dc.sum())} "
        f"(pcm8 half-LSB bias), "
        f"natural hum_log2 max {base.hum_log2.max()}"
    )


if __name__ == "__main__":
    main()
