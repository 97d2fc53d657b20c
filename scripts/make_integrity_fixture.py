"""Materialize the single-process audio-integrity oracle as a committed
parquet fixture (fixtures/oracle_integrity_n{N}.parquet) for q166.

Same design as the other audio fixtures: the dropout/stuck-run audit is an
all-integer deterministic function of the pinned clips table (shared
core/integrity.py kernel, independent driver loop here). Plants: every
40th decodable clip of >= 120 ms also yields its corrupted co_ variant
(one 12..39 ms exact-zero dropout + one 12..39 ms stuck-sample run at
id-hashed positions in disjoint halves).

Usage: python scripts/make_integrity_fixture.py [n_rows=4000]
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
COLS = ("n_samples", "max_zero_run", "max_rep_run", "dropout", "stuck", "keep")


def oracle_rows(indices) -> pd.DataFrame:
    """Integrity oracle for clip rows `indices` — mirrors
    operators/audio_ops._integrity_pdf(aug_every=40) exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.integrity import corrupted_variant, integrity_metrics
    from datasmith_spark.operators.audio_ops import INTEG_AUG_MIN_MS

    out = {c: [] for c in ("clip_id", "ok") + COLS}

    def _emit(cid, ok, m):
        out["clip_id"].append(cid)
        out["ok"].append(ok)
        for c in COLS:
            out[c].append(m[c] if m else (0 if c in COLS[:3] else False))

    for row in datagen.gen_batch(indices).itertuples(index=False):
        i = int(row.clip_id.rsplit("_", 1)[1])
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        if pcm is None or pcm.size == 0:
            _emit(row.clip_id, False, None)
            continue
        _emit(row.clip_id, True, integrity_metrics(pcm, sr))
        if i % AUG_EVERY == 0 and pcm.size * 1000 >= INTEG_AUG_MIN_MS * sr:
            y = corrupted_variant(pcm, sr, row.clip_id)
            _emit(f"co_{i:012d}", True, integrity_metrics(y, sr))
    df = pd.DataFrame(out)
    for c in ("n_samples", "max_zero_run", "max_rep_run"):
        df[c] = df[c].astype("int32")
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
    out = os.path.join(FIXTURE_DIR, f"oracle_integrity_n{n}.parquet")
    df.to_parquet(out, index=False)
    plants = df[df.clip_id.str.startswith("co_")]
    base = df[~df.clip_id.str.startswith("co_")]
    print(
        f"wrote {out}: {len(df)} rows; plants {len(plants)} "
        f"(flagged {int((~plants.keep).sum())}); base flagged {int((base.ok & ~base.keep).sum())}"
    )


if __name__ == "__main__":
    main()
