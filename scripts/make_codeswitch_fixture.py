"""Materialize the single-process code-switching oracle as a committed
parquet fixture (fixtures/oracle_codeswitch_n{N}.parquet) for q165.

Same design as the other fixtures: the window-vote stats are a
deterministic function of the pinned clips table and the frozen langid
model (shared core/langid.py kernel — codeswitch_stats / mixed_variant —
independent driver loop here). Plants: every 40th clip with a non-blank
transcript also yields its code-switched mx_ variant (original text + an
equal-length different-language sentence chosen by id hash). Measured on
the pinned corpus: 0 of 497 base transcripts falsely mixed; 95 of 99
plants recovered — the 4 misses are <= 4-word base transcripts where the
whole plant fits inside one or two windows (sub-window texts cannot
exhibit SEGMENT-level switching; principled boundary).

Usage: python scripts/make_codeswitch_fixture.py [n_rows=4000]
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
COLS = ("n_windows", "lang_primary", "n_primary", "lang_secondary", "n_secondary", "mixed")


def oracle_rows(indices) -> pd.DataFrame:
    """Code-switch oracle for clip rows `indices` — mirrors
    operators/text_analysis.codeswitch_clips(aug_every=40) exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.langid import codeswitch_stats, mixed_variant

    out = {c: [] for c in ("clip_id",) + COLS}

    def _emit(cid, st):
        out["clip_id"].append(cid)
        for c in COLS:
            out[c].append(st[c])

    for row in datagen.gen_batch(indices).itertuples(index=False):
        i = int(row.clip_id.rsplit("_", 1)[1])
        t = None if pd.isna(row.transcript) else str(row.transcript)
        _emit(row.clip_id, codeswitch_stats(t))
        if t and t.strip() and i % AUG_EVERY == 0:
            _emit(f"mx_{i:012d}", codeswitch_stats(mixed_variant(t, row.clip_id)))
    df = pd.DataFrame(out)
    for c in ("n_windows", "n_primary", "n_secondary"):
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
    out = os.path.join(FIXTURE_DIR, f"oracle_codeswitch_n{n}.parquet")
    df.to_parquet(out, index=False)
    plants = df[df.clip_id.str.startswith("mx_")]
    print(
        f"wrote {out}: {len(df)} rows ({len(plants)} plants, "
        f"{int(plants.mixed.sum())} recovered), "
        f"{int(df[~df.clip_id.str.startswith('mx_')].mixed.sum())} base mixed"
    )


if __name__ == "__main__":
    main()
