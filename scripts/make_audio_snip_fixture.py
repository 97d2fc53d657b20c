"""Materialize the single-process planted-snippet PROBE oracle as a
committed parquet fixture (fixtures/oracle_audio_snip_n{N}.parquet) for
q158's query-by-snippet retrieval lane.

For every LM_AUG_EVERY-th decodable clip of the pinned subset, cut the
deterministic 1-second query snippet (core/landmark.snippet_variant16:
id-hashed mid-clip start at any sub-hop phase, gain 0.6, pcm16
requantization) and record its (lm_hash, t) landmarks under a snip_ id —
mirroring operators/landmark._lm_probe_rows exactly (shared kernel,
independent driver loop). The retrieval INDEX side is the q157 landmark
fixture's clip_ rows; the driver's DuckDB oracle re-derives the entire
search — index stop-hash budget, probe-to-index hash join, position vote,
adjacent pooling, per-probe argmax, best-vs-rest confidence — in SQL over
the two committed key tables.

Usage: python scripts/make_audio_snip_fixture.py [n_rows=4000]
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
    """(clip_id, lm_hash, t) probe oracle rows for clip indices."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.landmark import landmark_hashes16, snippet_variant16
    from datasmith_spark.operators.landmark import LM_AUG_EVERY, _head16

    ids: list[str] = []
    hs: list[int] = []
    ts: list[int] = []
    for row in datagen.gen_batch(indices).itertuples(index=False):
        i = int(row.clip_id.rsplit("_", 1)[1])
        if i % LM_AUG_EVERY:
            continue
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        if not sr or sr <= 0:
            continue
        pcm = decode(row.bytes, row.codec)
        if pcm is None or pcm.size == 0:
            continue
        x16 = _head16(pcm, sr)
        if x16.size == 0:
            continue
        _, snip = snippet_variant16(x16, row.clip_id)
        for h, t in landmark_hashes16(snip):
            ids.append(f"snip_{i:012d}")
            hs.append(h)
            ts.append(t)
    return pd.DataFrame(
        {
            "clip_id": ids,
            "lm_hash": pd.array(hs, dtype="int64"),
            "t": pd.array(ts, dtype="int32"),
        }
    )


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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_snip_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} probe landmark rows, {df.clip_id.nunique()} probes")


if __name__ == "__main__":
    main()
