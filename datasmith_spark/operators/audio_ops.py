"""Audio prep operators: sample-rate normalization + log-mel featurization.

Arrow-batched mapInPandas over the clip table (the same conditional-enrich
shape as the decode stage, operators/scan_decode.py): bytes in, bytes or
compact features out, nothing per-row in Python at the Spark level. The
kernels live in core/resample.py and are shared with the tests' single-
process oracles, so both sides move together.

At 100 TB these are embarrassingly parallel narrow maps — no shuffle, no
cross-row state; the only knob that matters is Arrow batch size
(spark.sql.execution.arrow.maxRecordsPerBatch) against executor memory,
bounded here by the kernels' internal chunking.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..core.audio import ITEMSIZE, decode, encode
from ..core.resample import logmel, resample

RESAMPLED_DDL = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, resample_ok boolean"
)

LOGMEL_DDL = "clip_id string, ok boolean, n_frames int, n_mels int, feats array<double>"


def resample_clips(
    clips: DataFrame, target_sr: int, mode: str = "sinc", codec_out: str = "pcm16"
) -> DataFrame:
    """Normalize every decodable clip to target_sr, re-encoded as codec_out.

    Undecodable rows pass through byte-identical with resample_ok=false —
    the table stays complete for lineage; downstream filters decide.
    Already-at-rate clips are still re-encoded to codec_out so the output
    column is homogeneous (one codec) for training consumers.
    """
    if codec_out not in ITEMSIZE:
        raise ValueError(f"unknown codec_out: {codec_out}")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes, out_sr, out_dur, out_codec, ok = [], [], [], [], []
            for buf, sr, codec in zip(pdf["bytes"], pdf["sr_hz"], pdf["codec"]):
                sr = None if pd.isna(sr) else int(sr)
                pcm = decode(buf, codec) if sr and sr > 0 else None
                if pcm is None:
                    out_bytes.append(buf)
                    out_sr.append(sr)
                    out_dur.append(None)
                    out_codec.append(codec)
                    ok.append(False)
                    continue
                y = resample(pcm, int(sr), target_sr, mode=mode)
                out_bytes.append(encode(y, codec_out))
                out_sr.append(target_sr)
                out_dur.append(int(round(y.size / target_sr * 1000.0)))
                out_codec.append(codec_out)
                ok.append(True)
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "bytes": out_bytes,
                    "sr_hz": pd.array(out_sr, dtype="Int32"),
                    "dur_ms": pd.array(
                        [d if d is not None else pdf["dur_ms"].iloc[i] for i, d in enumerate(out_dur)],
                        dtype="Int32",
                    ),
                    "codec": out_codec,
                    "transcript": pdf["transcript"],
                    "resample_ok": ok,
                }
            )

    return clips.select(
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"
    ).mapInPandas(_run, schema=RESAMPLED_DDL)


def logmel_features(
    clips: DataFrame, n_fft: int = 512, hop: int = 256, n_mels: int = 40
) -> DataFrame:
    """Per-clip log-mel spectrogram, flattened row-major into one array.

    One output row per input row: ok=false for undecodable payloads,
    n_frames=0 for clips shorter than one FFT window. Flattening keeps the
    Arrow transfer a single fixed-type list column; consumers reshape with
    (n_frames, n_mels).
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            oks, nfs, feats = [], [], []
            for buf, sr, codec in zip(pdf["bytes"], pdf["sr_hz"], pdf["codec"]):
                sr = None if pd.isna(sr) else int(sr)
                pcm = decode(buf, codec) if sr and sr > 0 else None
                if pcm is None:
                    oks.append(False)
                    nfs.append(0)
                    feats.append(np.zeros(0))
                    continue
                m = logmel(pcm, int(sr), n_fft=n_fft, hop=hop, n_mels=n_mels)
                oks.append(True)
                nfs.append(m.shape[0])
                feats.append(m.reshape(-1))
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "ok": oks,
                    "n_frames": pd.array(nfs, dtype="Int32"),
                    "n_mels": pd.array([n_mels] * len(pdf), dtype="Int32"),
                    "feats": feats,
                }
            )

    return clips.select("clip_id", "bytes", "sr_hz", "codec").mapInPandas(
        _run, schema=LOGMEL_DDL
    )
