"""Materialize the single-process overlap-mix oracle as a committed parquet
fixture (fixtures/oracle_audio_mix_n{N}.parquet) for q89.

Pairing is index-based so any engine reproduces it: base clip i in
[0, N/2) mixes with overlay clip i + N/2. Determinism: the mix factor is
sqrt(10) by IEEE sqrt (no libm pow), both RMS terms use the fixed-order
_sumsq_tree reduction, the overlay resample is the fixed-order Lanczos
kernel, and the elementwise add is IEEE float64 — the same portability
contract as every committed audio fixture (make_audio_noise_fixture.py).

Usage: python scripts/make_audio_mix_fixture.py [n_rows=4000]
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

SIR_DB = 10
N_TOTAL = 4000  # pairing offset is N_TOTAL // 2 regardless of chunking


def oracle_rows(base_indices) -> pd.DataFrame:
    """Overlap-mix oracle for base rows `base_indices` — mirrors
    operators/audio_ops.py _mix_pdf exactly (overlay = base + N/2)."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode, encode
    from datasmith_spark.core.resample import mix_overlay

    half = N_TOTAL // 2
    base_indices = list(base_indices)
    bases = datagen.gen_batch(base_indices)
    ovls = datagen.gen_batch([i + half for i in base_indices])
    out = {"clip_id": [], "ovl_id": [], "mixed": [], "payload_md5": []}
    for b, o in zip(bases.itertuples(index=False), ovls.itertuples(index=False)):
        sr = None if pd.isna(b.sr_hz) else int(b.sr_hz)
        osr = None if pd.isna(o.sr_hz) else int(o.sr_hz)
        pcm = decode(b.bytes, b.codec) if sr and sr > 0 else None
        opcm = decode(o.bytes, o.codec) if osr and osr > 0 else None
        y = (
            mix_overlay(pcm, sr, opcm, osr, SIR_DB)
            if pcm is not None and opcm is not None
            else None
        )
        buf = b.bytes if y is None else encode(y, b.codec)
        out["clip_id"].append(b.clip_id)
        out["ovl_id"].append(o.clip_id)
        out["mixed"].append(y is not None)
        out["payload_md5"].append(None if buf is None else hashlib.md5(buf).hexdigest())
    return pd.DataFrame(out)


def _chunk(args) -> pd.DataFrame:
    lo, hi = args
    return oracle_rows(range(lo, hi))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_TOTAL
    assert n == N_TOTAL, "pairing offset is pinned to the committed table size"
    half = n // 2
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    chunks = [(lo, min(lo + 125, half)) for lo in range(0, half, 125)]
    procs = min(16, os.cpu_count() or 8)
    with mp.get_context("fork").Pool(procs) as pool:
        parts = pool.map(_chunk, chunks)
    df = pd.concat(parts, ignore_index=True)
    assert len(df) == half
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_mix_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows, {int(df['mixed'].sum())} mixed")


if __name__ == "__main__":
    main()
