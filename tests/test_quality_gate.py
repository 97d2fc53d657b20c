"""Fused five-lane quality gate (q167): per-lane agreement with the
standalone operators, conjunction semantics, arbitrary ids."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from datasmith_spark.core.audio import encode


class TestQualityGate:
    @pytest.fixture(scope="class")
    def gate(self, spark):
        from datasmith_spark import datagen
        from datasmith_spark.operators.audio_ops import quality_gate_clips

        clips = datagen.clips_df(spark, 160, n_partitions=4).cache()
        return clips, quality_gate_clips(clips).toPandas().set_index("clip_id")

    def test_lanes_agree_with_standalone_operators(self, spark, gate):
        """Fusion must not change a single verdict: each lane column equals
        the standalone operator's output on the same clips."""
        from datasmith_spark.core.vad import Q41_ACTIVE_DB
        from datasmith_spark.operators.audio_ops import integrity_clips, vad_clips
        from datasmith_spark.operators.text_analysis import transcript_compressibility

        clips, g = gate
        vad = {
            r.clip_id: r.keep
            for r in vad_clips(clips, active_db=Q41_ACTIVE_DB).collect()
        }
        integ = {r.clip_id: r.keep for r in integrity_clips(clips).collect()}
        text = {r.clip_id: r.keep for r in transcript_compressibility(clips).collect()}
        for cid, row in g.iterrows():
            assert row.vad_keep == vad[cid], cid
            assert row.integrity_keep == (integ[cid] if row.ok else False), cid
            assert row.text_keep == text[cid], cid

    def test_keep_is_conjunction(self, gate):
        _, g = gate
        want = (
            g.ok & g.vad_keep & g.spectral_keep & g.rate_keep
            & g.integrity_keep & g.text_keep
        )
        assert (g.keep == want).all()
        assert (~g.loc[~g.ok, "keep"]).all()

    def test_arbitrary_ids(self, spark):
        from datasmith_spark.operators.audio_ops import quality_gate_clips

        t = np.arange(16000) / 16000.0
        x = 0.5 * np.sin(2 * np.pi * 440 * t)
        rows = [
            ("s3://b/x y.wav", encode(x, "pcm16"), 16000, "pcm16",
             "a perfectly ordinary transcript with plenty of words to pass"),
            ("broken", b"\x01", None, "pcm16", "whatever"),
        ]
        df = spark.createDataFrame(
            rows, "clip_id string, bytes binary, sr_hz int, codec string, transcript string"
        )
        got = {r.clip_id: r for r in quality_gate_clips(df).collect()}
        assert got["s3://b/x y.wav"].ok
        assert not got["broken"].ok and not got["broken"].keep

    def test_registry_has_q167(self):
        from datasmith_spark.queries import ORACLE_SQL, QUERIES

        assert "q167_quality_gate" in QUERIES and "q167_quality_gate" in ORACLE_SQL


class TestGateAttribution:
    def test_attribution_sums_to_corpus_and_orders(self, spark):
        from datasmith_spark.queries import QUERIES

        got = (
            QUERIES["q168_gate_attribution"](spark, "/root/testdata/sf0.01")
            .toPandas()
            .sort_values("stage_order")
        )
        assert got.n_clips.sum() == 4000
        assert (got[got.stage == "keep"].n_clips > 0).all()
        order = {s: o for s, o in zip(got.stage, got.stage_order)}
        assert order.get("keep") == 6
        assert all(0 <= o <= 6 for o in got.stage_order)

    def test_registry_has_q168(self):
        from datasmith_spark.queries import ORACLE_SQL, QUERIES

        assert "q168_gate_attribution" in QUERIES and "q168_gate_attribution" in ORACLE_SQL
