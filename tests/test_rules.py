"""Native rule Column exprs vs the python kernel — row-exact on real data."""

import pandas as pd
from pyspark.sql import functions as F

from datasmith_spark.core import rules as R
from datasmith_spark.operators.rules import with_rule_stage

from .conftest import N_PARTS


def test_native_rules_match_python_kernel(spark, clips_path, clips_pdf):
    clips = spark.read.parquet(clips_path)
    got = (
        with_rule_stage(clips, N_PARTS)
        .select("clip_id", "drop_reasons")
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    exp = [
        R.rule_reasons(r.codec, int(r.sr_hz), int(r.dur_ms), len(r.bytes), r.transcript)
        for r in clips_pdf.itertuples(index=False)
    ]
    bad = [
        (i, list(a), e)
        for i, (a, e) in enumerate(zip(got.drop_reasons, exp))
        if list(a) != e
    ]
    assert not bad, bad[:5]


def test_rule_edge_cases(spark):
    rows = [
        # codec, sr, dur, payload, transcript
        ("pcm16", 16000, 1000, b"\x00" * 32000, "hello world one two three"),  # clean
        ("opus", 16000, 1000, b"\x00" * 32000, "hello world"),                 # unknown codec
        ("pcm16", 16000, 1000, b"", "hello"),                                   # empty audio
        ("pcm16", 16000, 1000, b"\x00" * 31999, "hello"),                       # misaligned
        ("pcm16", 12345, 1000, b"\x00" * 32000, "hello"),                       # bad sr
        ("pcm16", 16000, 10, b"\x00" * 320, "hello"),                           # too short
        ("pcm16", 16000, 1000, b"\x00" * 16000, "hello padding padding!"),      # dur mismatch
        ("pcm16", 16000, 1000, b"\x00" * 32000, "   "),                         # empty transcript
        ("pcm16", 16000, 60000, b"\x00" * 1920000, "short"),                    # len_ratio low
        ("pcm16", 16000, 1000, b"\x00" * 32000, "a b " * 30),                   # repetition
        ("pcm16", 16000, 2000, b"\x00" * 64000, "@#$%^& *()!! ~~ ##$$%%"),      # symbol noise
        (None, None, None, None, None),                                          # all-null row
    ]
    pdf = pd.DataFrame(rows, columns=["codec", "sr_hz", "dur_ms", "bytes", "transcript"])
    pdf["clip_id"] = [f"edge_{i}" for i in range(len(pdf))]
    sdf = spark.createDataFrame(
        pdf, "codec string, sr_hz int, dur_ms int, bytes binary, transcript string, clip_id string"
    )
    got = {
        r.clip_id: list(r.drop_reasons)
        for r in with_rule_stage(sdf, N_PARTS).select("clip_id", "drop_reasons").collect()
    }
    exp = {
        f"edge_{i}": R.rule_reasons(
            c, s, d, len(b) if b is not None else None, t
        )
        for i, (c, s, d, b, t) in enumerate(rows)
    }
    assert got == exp
    assert got["edge_0"] == []
    assert "unknown_codec" in got["edge_1"]
    assert "empty_audio" in got["edge_2"]
    assert "misaligned_audio" in got["edge_3"]
    assert "bad_sr" in got["edge_4"]
    assert "bad_duration" in got["edge_5"]
    assert "dur_mismatch" in got["edge_6"]
    assert "empty_transcript" in got["edge_7"]
    assert "len_ratio" in got["edge_8"]
    assert "repetition" in got["edge_9"]
    assert "symbol_noise" in got["edge_10"]
    assert set(got["edge_11"]) >= {"unknown_codec", "empty_audio", "bad_sr", "bad_duration", "empty_transcript"}
