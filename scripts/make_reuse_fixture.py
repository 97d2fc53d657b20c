"""Materialize the single-process transcript-reuse oracle as a committed
parquet fixture (fixtures/oracle_reuse_n{N}.parquet) for q177.

Independent derivation: hashlib md5 / zlib crc32 / a pandas group-agg over
the pinned clips table — no Spark, no shared operator code — mirroring
operators/audio_ops.transcript_reuse(plant_every=40) by construction.

Usage: python scripts/make_reuse_fixture.py [n_rows=4000]
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

PLANT_EVERY = 40
MIN_LEN = 20


def oracle_rows(n: int) -> pd.DataFrame:
    from datasmith_spark import datagen

    recs = []
    for row in datagen.gen_batch(range(n)).itertuples(index=False):
        t = row.transcript
        if t is None or len(t) < MIN_LEN:
            continue
        recs.append((t, hashlib.md5(row.bytes).hexdigest()))
        if zlib.crc32(row.clip_id.encode()) % PLANT_EVERY == 0:
            recs.append((t, hashlib.md5(row.bytes + b"\x00").hexdigest()))
    df = pd.DataFrame(recs, columns=["transcript", "audio_md5"])
    g = (
        df.groupby("transcript")
        .agg(n_clips=("audio_md5", "size"), n_distinct_audio=("audio_md5", "nunique"))
        .reset_index()
    )
    g = g[g.n_clips >= 2]
    out = pd.DataFrame(
        {
            "transcript_md5": [
                hashlib.md5(t.encode()).hexdigest() for t in g.transcript
            ],
            "n_clips": g.n_clips.astype("int64").values,
            "n_distinct_audio": g.n_distinct_audio.astype("int64").values,
        }
    )
    out["mislabel"] = out.n_distinct_audio >= 2
    out["exact_dup"] = (out.n_clips >= 2) & (out.n_distinct_audio == 1)
    return out.reset_index(drop=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    df = oracle_rows(n)
    out = os.path.join(FIXTURE_DIR, f"oracle_reuse_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(
        f"wrote {out}: {len(df)} groups; mislabel {int(df.mislabel.sum())}, "
        f"exact_dup {int(df.exact_dup.sum())}, max group {int(df.n_clips.max())}"
    )


if __name__ == "__main__":
    main()
