"""Materialize the single-process segmentation oracle as a committed
parquet fixture (fixtures/oracle_audio_segment_n{N}.parquet) for q55.

Same design as make_audio_speed_fixture.py: the per-segment byte-slice
digest is a deterministic function of the pinned clips table that DuckDB
cannot re-derive, so a single-process pass records it (shared VAD span
kernel, independent driver loop). The slices are byte cuts of the encoded
payload — no float path at all beyond the VAD energy test, which is the
q41/q44 fixture-proven kernel.

Usage: python scripts/make_audio_segment_fixture.py [n_rows=4000]
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

SEG_MS = 1000
HOP_MS = 500


def oracle_rows(indices) -> pd.DataFrame:
    """Segmentation oracle for clip rows `indices` — mirrors
    operators/audio_ops.py _segment_pdf exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import ITEMSIZE, decode
    from datasmith_spark.core.vad import ACTIVE_DB, FRAME_MS, active_span_samples

    clips = datagen.gen_batch(indices)
    out = {
        "clip_id": [], "seg_idx": [], "start_ms": [], "dur_ms": [],
        "ok": [], "payload_md5": [],
    }

    def _push(cid, idx, start_ms, dur, ok, buf):
        out["clip_id"].append(cid)
        out["seg_idx"].append(idx)
        out["start_ms"].append(start_ms)
        out["dur_ms"].append(dur)
        out["ok"].append(ok)
        out["payload_md5"].append(
            None if buf is None else hashlib.md5(buf).hexdigest()
        )

    for row in clips.itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        span = (
            active_span_samples(pcm, sr, FRAME_MS, ACTIVE_DB)
            if pcm is not None
            else None
        )
        if span is None:
            _push(row.clip_id, None, None,
                  None if pd.isna(row.dur_ms) else int(row.dur_ms),
                  False, row.bytes)
            continue
        lo, hi = span
        seg = max(1, sr * SEG_MS // 1000)
        hop = max(1, sr * HOP_MS // 1000)
        isz = ITEMSIZE[row.codec]
        starts = list(range(lo, hi - seg + 1, hop))
        if not starts:
            _push(row.clip_id, 0, lo * 1000 // sr, (hi - lo) * 1000 // sr,
                  True, bytes(row.bytes[lo * isz : hi * isz]))
            continue
        for i, s in enumerate(starts):
            _push(row.clip_id, i, s * 1000 // sr, seg * 1000 // sr,
                  True, bytes(row.bytes[s * isz : (s + seg) * isz]))
    df = pd.DataFrame(out)
    for k in ("seg_idx", "start_ms", "dur_ms"):
        df[k] = df[k].astype("Int32")
    return df


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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_segment_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(
        f"wrote {out}: {len(df)} rows from {n} clips, "
        f"{int(df['ok'].sum())} segments"
    )


if __name__ == "__main__":
    main()
