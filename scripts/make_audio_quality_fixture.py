"""Materialize the single-process spectral-quality + speaking-rate oracle as
a committed parquet fixture (fixtures/oracle_audio_quality_n{N}.parquet) for
q46/q47.

Same design as make_audio_vad_fixture.py (q41/q44): the metrics are
deterministic functions of the pinned clips table (seed=42, row index) that
DuckDB cannot re-derive (it cannot decode the audio), so a single-process
pass records them and the driver's DuckDB oracle reads them back while the
Spark query recomputes them distributed. Every emitted metric is an integer
or boolean (core/spectral.py contract: frexp log2 bands, cross-multiplied
predicates, no libm transcendentals), so the value-hash compare is direct
and the fixture is host-portable; tests/test_spectral.py regenerates a
sample and asserts equality.

Usage: python scripts/make_audio_quality_fixture.py [n_rows=4000]
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
    """Spectral + rate oracle for clip rows `indices` — mirrors
    operators/audio_ops.py _spectral_pdf / _rate_pdf exactly (shared
    kernels, independent driver loop)."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.spectral import (
        bw_bin_to_hz,
        speaking_rate_keep,
        spectral_metrics,
    )
    from datasmith_spark.core.vad import FRAME_MS, vad_metrics

    clips = datagen.gen_batch(indices)
    out = {
        "clip_id": [], "ok": [], "n_bins": [], "n_harmonic": [], "snr_log2": [],
        "snr_ok": [], "bw_hz": [], "narrowband": [], "keep": [],
        "n_chars": [], "active_ms": [], "rate_keep": [],
    }
    for row in clips.itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        ok = pcm is not None
        n_bins, n_harm, snr_log2, snr_ok, bw_bin, narrow = spectral_metrics(pcm)
        out["clip_id"].append(row.clip_id)
        out["ok"].append(ok)
        out["n_bins"].append(n_bins)
        out["n_harmonic"].append(n_harm)
        out["snr_log2"].append(snr_log2)
        out["snr_ok"].append(snr_ok)
        out["bw_hz"].append(bw_bin_to_hz(bw_bin, sr) if ok else None)
        out["narrowband"].append(narrow)
        out["keep"].append(ok and snr_ok and not narrow)
        _, _, n_active, _, _, _ = vad_metrics(pcm, sr if ok else 0)
        tr = row.transcript
        n_chars = 0 if tr is None or pd.isna(tr) else len(str(tr).strip())
        active_ms = n_active * FRAME_MS if ok else None
        out["n_chars"].append(n_chars)
        out["active_ms"].append(active_ms)
        out["rate_keep"].append(speaking_rate_keep(n_chars, active_ms))
    df = pd.DataFrame(out)
    for c in ("n_bins", "n_harmonic", "snr_log2", "bw_hz", "n_chars", "active_ms"):
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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_quality_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(
        f"wrote {out}: {len(df)} rows, {int(df['ok'].sum())} decoded, "
        f"{int(df['snr_ok'].sum())} snr_ok, {int(df['narrowband'].sum())} "
        f"narrowband, {int(df['keep'].sum())} spectral-kept, "
        f"{int(df['rate_keep'].sum())} rate-kept"
    )


if __name__ == "__main__":
    main()
