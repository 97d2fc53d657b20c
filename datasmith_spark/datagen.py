"""Deterministic synthetic `clips` table (FIXTURES.md §1, seed=42).

Every row is a pure function of its integer index: rng = PCG64(seed=[42, i]).
Generation is therefore embarrassingly parallel, identical regardless of
partitioning/batching, and reproducible between the distributed Spark
generator and the single-process oracle.

Schema (BASELINE.json input_hint, authoritative):
    clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
    transcript string
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd

from .core import audio, text

SEED = 42

SR_CHOICES = np.array([8000, 16000, 22050, 44100, 48000])
SR_PROBS = np.array([0.10, 0.55, 0.10, 0.15, 0.10])
BAD_SR_CHOICES = np.array([0, -1, 192000])

CODEC_CHOICES = ("pcm16", "pcm8", "float32", "mulaw", "alaw")
CODEC_PROBS = np.array([0.55, 0.15, 0.12, 0.10, 0.08])  # Zipf-ish, pcm16 hot
UNKNOWN_CODECS = ("opus", "mp3")

# corruption rates (FIXTURES.md §1)
P_BAD_SR = 0.01
P_UNKNOWN_CODEC = 0.005
P_AUDIO_CORRUPT = 0.01
P_DUR_MISMATCH = 0.02
P_CPS_OUTLIER = 0.03
P_PII = 0.05
P_TOX = 0.02
P_REPETITION = 0.02
P_SYMBOL_NOISE = 0.02
P_EMPTY_TRANSCRIPT = 0.01

_AVG_WORD_LEN = {"en": 4.2, "es": 4.6, "de": 4.8, "fr": 4.3, "zh": 3.4, "ru": 4.5}


def n_rows_for_sf(sf: float) -> int:
    """SF=0.001 -> 1k rows, 0.01 -> 10k, 0.1 -> 100k."""
    return int(round(sf * 1_000_000))


def _make_transcript(rng: np.random.Generator, lang: str, dur_ms: int) -> str:
    if rng.random() < P_EMPTY_TRANSCRIPT:
        return "" if rng.random() < 0.5 else "   "
    dur_s = dur_ms / 1000.0
    if rng.random() < P_CPS_OUTLIER:
        cps = rng.uniform(0.1, 1.5) if rng.random() < 0.5 else rng.uniform(60.0, 120.0)
    else:
        cps = rng.uniform(8.0, 25.0)
    target_chars = max(3.0, cps * dur_s)
    n_words = max(1, int(round(target_chars / (_AVG_WORD_LEN[lang] + 1.0))))
    n_words = min(n_words, 4000)  # cap pathological upper tail
    sent = text.gen_sentence(rng, lang, n_words)
    words = sent.split(" ")

    if rng.random() < P_REPETITION and len(words) >= 24:
        # repeat a short phrase over ~80% of the word positions
        plen = int(rng.integers(2, 5))
        start = int(rng.integers(0, max(1, len(words) - plen)))
        phrase = words[start : start + plen]
        n_rep = max(1, int(len(words) * 0.8) // plen)
        keep = words[: max(1, len(words) - n_rep * plen)]
        words = keep + phrase * n_rep

    if rng.random() < P_PII:
        for _ in range(int(rng.integers(1, 4))):
            gen = text.PII_GENERATORS[int(rng.integers(len(text.PII_GENERATORS)))]
            pos = int(rng.integers(0, len(words) + 1))
            words.insert(pos, gen(rng))

    if rng.random() < P_TOX:
        for _ in range(int(rng.integers(1, 3))):
            tok = text.TOXICITY_LEXICON[int(rng.integers(len(text.TOXICITY_LEXICON)))]
            pos = int(rng.integers(0, len(words) + 1))
            words.insert(pos, tok)

    out = " ".join(words)

    if rng.random() < P_SYMBOL_NOISE:
        # inject symbol runs to push non-alnum density past the rule threshold
        chars = list(out)
        n_inject = max(8, int(len(chars) * 0.4))
        positions = rng.integers(0, len(chars) + 1, size=n_inject)
        for p in sorted((int(x) for x in positions), reverse=True):
            sym = text.SYMBOL_NOISE_CHARS[int(rng.integers(len(text.SYMBOL_NOISE_CHARS)))]
            chars.insert(p, sym * int(rng.integers(1, 4)))
        out = "".join(chars)
    return out


# wavetable synthesis: one sine period, phase-accumulated integer lookup.
# ~6x faster than np.sin per sample; the table quantization is simply part of
# the (deterministic) generated signal.
_TABLE_N = 1 << 13
_SIN_TABLE = np.sin(2.0 * np.pi * np.arange(_TABLE_N) / _TABLE_N)
_ARANGE_I = np.arange(1 << 16, dtype=np.int64)
_Q = 16  # fixed-point fraction bits for the phase accumulator


def _ar_i(n: int) -> np.ndarray:
    global _ARANGE_I
    if _ARANGE_I.size < n:
        _ARANGE_I = np.arange(max(n, 2 * _ARANGE_I.size), dtype=np.int64)
    return _ARANGE_I[:n]


def _synth_signal(rng: np.random.Generator, n_samples: int, sr_eff: int) -> np.ndarray:
    """1-3 wavetable sinusoids + Gaussian noise, peak = A ~ U(0.05, 0.95).

    Pure-integer fixed-point phase accumulation (deterministic, no float
    rounding drift, no per-sample astype).
    """
    amp = rng.uniform(0.05, 0.95)
    n_sin = int(rng.integers(1, 4))
    k = _ar_i(n_samples)
    sig = np.zeros(n_samples, dtype=np.float64)
    for _ in range(n_sin):
        f = rng.uniform(80.0, max(120.0, 0.45 * sr_eff))
        ph = rng.uniform(0.0, _TABLE_N)
        w = rng.uniform(0.3, 1.0)
        step_q = int(round(f * _TABLE_N / max(sr_eff, 1) * (1 << _Q)))
        ph_q = int(round(ph * (1 << _Q)))
        idx = ((k * step_q + ph_q) >> _Q) & (_TABLE_N - 1)
        sig += w * _SIN_TABLE[idx]
    sig += 0.05 * rng.standard_normal(n_samples, dtype=np.float32)
    peak = np.max(np.abs(sig)) if n_samples else 1.0
    if peak > 0:
        sig *= amp / peak
    return sig


def gen_row(i: int, with_signal: bool = False) -> dict:
    """Generate clip row i. Draw order is FROZEN — do not reorder."""
    rng = np.random.default_rng([SEED, int(i)])

    lang = text.zipf_lang(rng.random())
    sr = int(SR_CHOICES[rng.choice(len(SR_CHOICES), p=SR_PROBS)])
    bad_sr = rng.random() < P_BAD_SR
    if bad_sr:
        sr = int(BAD_SR_CHOICES[int(rng.integers(len(BAD_SR_CHOICES)))])
    dur_ms = int(np.clip(np.round(np.exp(rng.normal(np.log(6000.0), 0.7))), 50, 120_000))

    codec = CODEC_CHOICES[rng.choice(len(CODEC_CHOICES), p=CODEC_PROBS)]
    if rng.random() < P_UNKNOWN_CODEC:
        codec = UNKNOWN_CODECS[int(rng.integers(len(UNKNOWN_CODECS)))]

    sr_eff = sr if sr in SR_CHOICES else 16000
    n_samples = int(round(sr_eff * dur_ms / 1000.0))
    if rng.random() < P_DUR_MISMATCH:
        n_samples = int(round(n_samples * (0.6 if rng.random() < 0.5 else 1.3)))
    n_samples = max(n_samples, 1)

    sig = _synth_signal(rng, n_samples, sr_eff)
    enc_codec = codec if codec in audio.ITEMSIZE else "pcm16"
    buf = audio.encode(sig, enc_codec)

    if rng.random() < P_AUDIO_CORRUPT:
        mode = int(rng.integers(3))
        if mode == 0:
            buf = b""
        elif mode == 1:
            buf = buf[: max(1, len(buf) // 2) | 1]  # odd-length truncation
        else:
            buf = rng.bytes(int(rng.integers(3, 4097)) | 1)  # odd-length garbage

    transcript = _make_transcript(rng, lang, dur_ms)

    row = {
        "clip_id": f"clip_{i:012d}",
        "bytes": buf,
        "sr_hz": sr,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": transcript,
    }
    if with_signal:
        row["_signal"] = sig
        row["_lang_true"] = lang
    return row


def gen_batch(indices: Iterable[int]) -> pd.DataFrame:
    rows = [gen_row(int(i)) for i in indices]
    df = pd.DataFrame(rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"])
    df["sr_hz"] = df["sr_hz"].astype("int32")
    df["dur_ms"] = df["dur_ms"].astype("int32")
    return df


CLIPS_SCHEMA_DDL = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
)


def clips_df(spark, n_rows: int, n_partitions: int | None = None):
    """Distributed deterministic generation: spark.range -> mapInPandas.

    Output is identical for any n_partitions (row i depends only on i).
    """
    if n_partitions is None:
        n_partitions = max(1, min(256, n_rows // 256 or 1))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            # sub-chunk to bound Arrow batch memory (rows carry ~0.2MB audio)
            for s in range(0, len(ids), 64):
                yield gen_batch(ids[s : s + 64])

    return (
        spark.range(0, n_rows, numPartitions=n_partitions)
        .mapInPandas(_gen, schema=CLIPS_SCHEMA_DDL)
    )


def clips_pdf(n_rows: int) -> pd.DataFrame:
    """Single-process generation (oracle / unit tests)."""
    return gen_batch(range(n_rows))


_ARROW_SCHEMA_FIELDS = [
    ("clip_id", "string"), ("bytes", "binary"), ("sr_hz", "int32"),
    ("dur_ms", "int32"), ("codec", "string"), ("transcript", "string"),
]


def _write_chunk(args: tuple[str, int, int]) -> int:
    """Worker: generate rows [lo, hi) and write one parquet file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path, lo, hi = args
    schema = pa.schema([pa.field(n, getattr(pa, t)()) for n, t in _ARROW_SCHEMA_FIELDS])
    with pq.ParquetWriter(path, schema, compression="snappy") as w:
        for s in range(lo, hi, 64):
            pdf = gen_batch(range(s, min(s + 64, hi)))
            w.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False))
    return hi - lo


def write_clips_parquet(out_dir: str, n_rows: int, procs: int | None = None,
                        rows_per_file: int = 625) -> None:
    """Fixture generation OUTSIDE Spark: multiprocessing + direct pyarrow
    writes (one file per chunk), then an atomic _SUCCESS marker.

    Used by bench.py to materialize the clips input table; the benchmark
    itself then times scan+pipeline only. Bypassing the JVM here avoids
    paying the python->JVM->parquet round-trip for data that is a pure
    function of the row index anyway. Identical content to clips_df().
    """
    import multiprocessing as mp
    import os

    os.makedirs(out_dir, exist_ok=True)
    # remove only files this function writes — never subdirectories or
    # unrelated files a caller's out_dir might contain
    for f in os.listdir(out_dir):
        if (f.startswith("part-") and f.endswith(".parquet")) or f == "_SUCCESS":
            os.unlink(os.path.join(out_dir, f))
    chunks = [
        (os.path.join(out_dir, f"part-{lo:08d}.parquet"), lo, min(lo + rows_per_file, n_rows))
        for lo in range(0, n_rows, rows_per_file)
    ]
    procs = procs or min(32, os.cpu_count() or 8)
    with mp.get_context("fork").Pool(procs) as pool:
        done = sum(pool.imap_unordered(_write_chunk, chunks))
    assert done == n_rows
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass
