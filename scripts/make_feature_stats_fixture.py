"""Materialize the single-process corpus-feature-statistics oracles as
committed parquet fixtures for q182/q183:

  fixtures/oracle_feature_qstats_n{N}.parquet — per-clip per-bin fixed-
    point log-mel partials (clip_id, bin, n_frames, sum_q, sumsq_q); the
    q182 oracle aggregates them in SQL, so the DISTRIBUTED reduce is
    checked against an independent single-process pass over every clip.
  fixtures/oracle_corpus_cmvn_n{N}.parquet — corpus-CMVN feature digests
    (clip_id, ok, n_frames, n_mels, feats_md5) derived from the globally
    reduced statistics; checks the broadcast-apply pass bit-for-bit.

Exactness: the quantization q = rint(logmel * 4096) makes every sum an
integer (order-independent), and the normalization constants are single
IEEE ops on those exact integers — so this single-process derivation and
Spark's shuffle-scheduled reduce agree bit-for-bit (portability rules of
make_audio_ops_fixture.py apply: fixed-order mel projection, no BLAS).

Usage: python scripts/make_feature_stats_fixture.py [n_rows=4000]
"""

from __future__ import annotations

import hashlib
import multiprocessing as mp
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

N_FFT, HOP, N_MELS = 512, 256, 40


def stats_rows(indices) -> pd.DataFrame:
    """Per-clip q-stats partials for clip rows `indices`."""
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.resample import logmel_qstats

    clips = datagen.gen_batch(indices)
    ids, bins, nfs, sums, sqs = [], [], [], [], []
    for row in clips.itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        if pcm is None:
            continue
        nf, sum_q, sumsq_q = logmel_qstats(pcm, sr, n_fft=N_FFT, hop=HOP, n_mels=N_MELS)
        if nf == 0:
            continue
        ids.extend([row.clip_id] * N_MELS)
        bins.extend(range(N_MELS))
        nfs.extend([nf] * N_MELS)
        sums.extend(sum_q.tolist())
        sqs.extend(sumsq_q.tolist())
    return pd.DataFrame(
        {
            "clip_id": ids,
            "bin": pd.array(bins, dtype="int32"),
            "n_frames": pd.array(nfs, dtype="int32"),
            "sum_q": pd.array(sums, dtype="int64"),
            "sumsq_q": pd.array(sqs, dtype="int64"),
        }
    )


def cmvn_rows(args) -> pd.DataFrame:
    """Corpus-CMVN digests for clip rows `indices` under global constants."""
    indices, mean_q, istd_q = args
    from datasmith_spark import datagen
    from datasmith_spark.core.audio import decode
    from datasmith_spark.core.resample import corpus_cmvn_apply

    clips = datagen.gen_batch(indices)
    out = {"clip_id": [], "ok": [], "n_frames": [], "n_mels": [], "feats_md5": []}
    for row in clips.itertuples(index=False):
        sr = None if pd.isna(row.sr_hz) else int(row.sr_hz)
        pcm = decode(row.bytes, row.codec) if sr and sr > 0 else None
        out["clip_id"].append(row.clip_id)
        out["n_mels"].append(N_MELS)
        if pcm is None:
            out["ok"].append(False)
            out["n_frames"].append(0)
            a = np.zeros((0, N_MELS))
        else:
            a = corpus_cmvn_apply(
                pcm, sr, mean_q, istd_q, n_fft=N_FFT, hop=HOP, n_mels=N_MELS
            )
            out["ok"].append(True)
            out["n_frames"].append(a.shape[0])
        out["feats_md5"].append(
            hashlib.md5(
                np.ascontiguousarray(a.reshape(-1), dtype="<f8").tobytes()
            ).hexdigest()
        )
    df = pd.DataFrame(out)
    df["n_frames"] = df["n_frames"].astype("int32")
    df["n_mels"] = df["n_mels"].astype("int32")
    return df


def _stats_chunk(args) -> pd.DataFrame:
    lo, hi = args
    return stats_rows(range(lo, hi))


def main() -> None:
    from datasmith_spark.core.resample import corpus_cmvn_constants

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    chunks = [(lo, min(lo + 125, n)) for lo in range(0, n, 125)]
    procs = min(16, os.cpu_count() or 8)
    with mp.get_context("fork").Pool(procs) as pool:
        parts = pool.map(_stats_chunk, chunks)
    stats = pd.concat(parts, ignore_index=True)
    out1 = os.path.join(FIXTURE_DIR, f"oracle_feature_qstats_n{n}.parquet")
    stats.to_parquet(out1, index=False)
    print(out1, len(stats), "rows")

    g = stats.groupby("bin", sort=True).agg(
        n_frames=("n_frames", "sum"), sum_q=("sum_q", "sum"), sumsq_q=("sumsq_q", "sum")
    )
    n_total = int(g["n_frames"].iloc[0])
    mean_q, istd_q = corpus_cmvn_constants(
        n_total,
        g["sum_q"].to_numpy(dtype=np.int64),
        g["sumsq_q"].to_numpy(dtype=np.int64),
    )
    with mp.get_context("fork").Pool(procs) as pool:
        parts = pool.map(
            cmvn_rows, [(range(lo, hi), mean_q, istd_q) for lo, hi in chunks]
        )
    cm = pd.concat(parts, ignore_index=True)
    assert len(cm) == n
    out2 = os.path.join(FIXTURE_DIR, f"oracle_corpus_cmvn_n{n}.parquet")
    cm.to_parquet(out2, index=False)
    print(out2, len(cm), "rows")


if __name__ == "__main__":
    main()
