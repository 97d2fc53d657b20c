"""Materialize the single-process reverb-augmentation oracle as a committed
parquet fixture (fixtures/oracle_audio_reverb_n{N}.parquet) for q71.

Same design as make_audio_noise_fixture.py. Determinism: the RIR is built
from a counter-based Philox stream keyed by md5(clip_id) (stream-stable per
numpy's Generator policy), energy-normalized by IEEE sqrt of the fixed-order
_sumsq_tree, and the convolution runs through numpy's pocketfft — the same
deterministic FFT the committed log-mel (q37) and fingerprint (q38) fixtures
already pin. The fixture-honesty pytest regenerates a sample per run.

Usage: python scripts/make_audio_reverb_fixture.py [n_rows=4000]
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

TAIL_MS = 200


def oracle_rows(indices) -> pd.DataFrame:
    """Reverb oracle for clip rows `indices` — mirrors
    operators/audio_ops.py _reverb_pdf exactly."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode, encode
    from datasmith_spark.core.resample import reverb

    clips = datagen.gen_batch(indices)
    out = {"clip_id": [], "augmented": [], "payload_md5": []}
    for row in clips.itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        y = reverb(pcm, str(row.clip_id), sr, TAIL_MS) if pcm is not None else None
        buf = row.bytes if y is None else encode(y, row.codec)
        out["clip_id"].append(row.clip_id)
        out["augmented"].append(y is not None)
        out["payload_md5"].append(
            None if buf is None else hashlib.md5(buf).hexdigest()
        )
    return pd.DataFrame(out)


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
    out = os.path.join(FIXTURE_DIR, f"oracle_audio_reverb_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows, {int(df['augmented'].sum())} augmented")


if __name__ == "__main__":
    main()
