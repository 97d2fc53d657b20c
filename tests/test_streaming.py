"""Structured Streaming lift: stream output == batch output, restart resumes.

The stage UDFs are stateless per row, so draining the same clips through
readStream+foreachBatch must reproduce the batch labels exactly.
"""

from __future__ import annotations

import pathlib
import shutil

import pytest
from pyspark.sql import functions as F

from datasmith_spark.pipeline import LABEL_COLS, label_clips
from datasmith_spark.streaming import run_streaming_pipeline
from tests.conftest import cache_dir

N_PARTS = 16


@pytest.fixture(scope="module")
def stream_dirs(spark, clips_path):
    """Input dir holding the test clips as two separate file drops."""
    base = cache_dir() / "streaming"
    inp, out = base / "input", base / "out"
    if not (inp / "_drop2" / "_SUCCESS").exists():
        shutil.rmtree(base, ignore_errors=True)
        clips = spark.read.parquet(clips_path)
        half = F.pmod(F.crc32(F.col("clip_id").cast("binary")), F.lit(2))
        clips.filter(half == 0).write.parquet(str(inp / "_drop1"))
        clips.filter(half == 1).write.parquet(str(inp / "_drop2"))
        # file source reads the leaf files; move them up so both drops land
        # in one listing dir
        for d in ("_drop1", "_drop2"):
            for f in (inp / d).glob("*.parquet"):
                f.rename(inp / f"{d.lstrip('_')}-{f.name.lstrip('_')}")
    return str(inp), str(out)


def test_stream_matches_batch(spark, clips_path, stream_dirs):
    inp, out = stream_dirs
    shutil.rmtree(out, ignore_errors=True)
    run_streaming_pipeline(spark, inp, out, n_parts=N_PARTS, max_files_per_trigger=4)

    got = (
        spark.read.parquet(f"{out}/labels")
        .select(*LABEL_COLS)
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    want = (
        label_clips(spark.read.parquet(clips_path), n_parts=N_PARTS)
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ("clip_id", "keep", "drop_stage", "lang", "scrubbed_transcript"):
        a = got[c].fillna("<null>").astype(str)
        b = want[c].fillna("<null>").astype(str)
        assert (a == b).all(), f"{c} mismatch"
    # metrics side table written per batch
    m = spark.read.parquet(f"{out}/metrics")
    assert m.count() > 0 and m.filter(F.col("run_id").startswith("stream-")).count() > 0


def test_stream_restart_is_noop(spark, stream_dirs):
    """availableNow rerun over an unchanged input dir must not duplicate."""
    inp, out = stream_dirs
    n_before = spark.read.parquet(f"{out}/labels").count()
    run_streaming_pipeline(spark, inp, out, n_parts=N_PARTS)
    n_after = spark.read.parquet(f"{out}/labels").count()
    assert n_after == n_before


def test_batch_replay_idempotent(spark, clips_path, tmp_path):
    """Crash-between-write-and-commit: replaying the SAME batch_id must not
    duplicate label or metrics rows (dynamic overwrite of batch partitions)."""
    from datasmith_spark.streaming import make_batch_sink
    from datasmith_spark.tables import TableLayer

    tl = TableLayer(str(tmp_path / "replay_out"))
    sink = make_batch_sink(tl)
    labels = label_clips(spark.read.parquet(clips_path).limit(200), n_parts=N_PARTS)
    sink(labels, 0)
    n_labels = spark.read.parquet(tl.path("labels")).count()
    n_metrics = spark.read.parquet(tl.path("metrics")).count()
    sink(labels, 0)  # replay after simulated checkpoint-commit failure
    assert spark.read.parquet(tl.path("labels")).count() == n_labels
    assert spark.read.parquet(tl.path("metrics")).count() == n_metrics
    # a NEW batch appends (its own partitions), not overwrites
    sink(labels, 1)
    assert spark.read.parquet(tl.path("labels")).count() == 2 * n_labels
