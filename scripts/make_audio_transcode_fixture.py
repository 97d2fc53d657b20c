"""Materialize the single-process codec-normalization oracle as a committed
parquet fixture (fixtures/oracle_audio_transcode_n{N}.parquet) for q78.

Same design as make_audio_noise_fixture.py. Pure integer/quantization
computation (decode + pcm16 requantization, no DSP kernel, no floats
reduced) — host-portable by construction. Target-codec rows pass through
byte-identical; undecodable rows pass through with transcoded=false.

Usage: python scripts/make_audio_transcode_fixture.py [n_rows=4000]
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

CODEC_OUT = "pcm16"


def oracle_rows(indices) -> pd.DataFrame:
    """Transcode oracle for clip rows `indices` — runs the SHARED batch
    kernel (operators/audio_ops._transcode_pdf) in a single process."""
    from datasmith_spark import datagen
    from datasmith_spark.operators.audio_ops import _transcode_pdf

    return _transcode_pdf(datagen.gen_batch(indices), CODEC_OUT, True)


def _chunk(args) -> pd.DataFrame:
    lo, hi = args
    return oracle_rows(range(lo, hi))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    chunks = [(lo, min(lo + 250, n)) for lo in range(0, n, 250)]
    procs = min(16, os.cpu_count() or 8)
    with mp.get_context("fork").Pool(procs) as pool:
        parts = pool.map(_chunk, chunks)
    df = pd.concat(parts, ignore_index=True)
    assert len(df) == n
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_transcode_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(
        f"wrote {out}: {len(df)} rows, {int(df['transcoded'].sum())} transcoded, "
        f"{int((~df['transcoded']).sum())} passthrough"
    )


if __name__ == "__main__":
    main()
