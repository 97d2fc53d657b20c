"""Materialize the single-process audio-VAD oracle as a committed parquet
fixture (fixtures/oracle_audio_vad_n{N}.parquet) for q41.

Same design as make_audio_ops_fixture.py (q36/q37): the VAD/trim/clipping
metrics are deterministic functions of the pinned clips table (seed=42, row
index) that DuckDB cannot re-derive (it cannot decode the audio), so a
single-process pass records them and the driver's DuckDB oracle reads them
back while the Spark query recomputes them distributed. Unlike q36/q37 no
digest indirection is needed: every emitted metric is an integer or boolean
(core/vad.py determinism contract), so the value-hash compare is direct.

Portability: the framed-energy reduction uses a pinned elementwise fold
(core/vad.py _frame_sumsq), never np.sum/BLAS, so the fixture reproduces
bit-for-bit across hosts; tests/test_vad.py regenerates a sample and asserts
equality.

Usage: python scripts/make_audio_vad_fixture.py [n_rows=4000]
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
    """VAD oracle for clip rows `indices` — mirrors operators/audio_ops.py
    _vad_pdf exactly (shared kernels, independent driver loop)."""
    import hashlib

    from datasmith_spark import datagen
    from datasmith_spark.core.audio import ITEMSIZE, decode
    from datasmith_spark.core.vad import (
        Q41_ACTIVE_DB,
        active_span_samples,
        vad_keep,
        vad_metrics,
    )

    clips = datagen.gen_batch(indices)
    out = {
        "clip_id": [], "ok": [], "n_samples": [], "n_frames": [], "n_active": [],
        "trim_start_ms": [], "trim_end_ms": [], "n_clipped": [], "keep": [],
        "trimmed": [], "dur_ms": [], "payload_md5": [],
    }
    for row in clips.itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        ok = pcm is not None
        ns, nf, na, t0, t1, nc = vad_metrics(
            pcm, sr if ok else 0, active_db=Q41_ACTIVE_DB
        )
        out["clip_id"].append(row.clip_id)
        out["ok"].append(ok)
        out["n_samples"].append(ns)
        out["n_frames"].append(nf)
        out["n_active"].append(na)
        out["trim_start_ms"].append(t0)
        out["trim_end_ms"].append(t1)
        out["n_clipped"].append(nc)
        out["keep"].append(vad_keep(ok, ns, nf, na, nc))
        # q44 lossless byte-cut trim — mirrors operators/audio_ops.py _trim_pdf
        span = (
            active_span_samples(pcm, sr, active_db=Q41_ACTIVE_DB) if ok else None
        )
        if span is None:
            buf = row.bytes
            out["trimmed"].append(False)
            out["dur_ms"].append(None if pd.isna(row.dur_ms) else int(row.dur_ms))
        else:
            lo, hi = span
            isz = ITEMSIZE[row.codec]
            buf = bytes(row.bytes[lo * isz : hi * isz])
            out["trimmed"].append(lo > 0 or hi < pcm.size)
            out["dur_ms"].append(int(round((hi - lo) / sr * 1000.0)))
        out["payload_md5"].append(
            None if buf is None else hashlib.md5(buf).hexdigest()
        )
    df = pd.DataFrame(out)
    for c in ("n_samples", "n_frames", "n_active", "trim_start_ms",
              "trim_end_ms", "n_clipped", "dur_ms"):
        df[c] = df[c].astype("Int32")
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
    assert len(df) == n
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_vad_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(
        f"wrote {out}: {len(df)} rows, {int(df['ok'].sum())} decoded, "
        f"{int(df['keep'].sum())} kept, {int(df['trimmed'].sum())} trimmed"
    )


if __name__ == "__main__":
    main()
