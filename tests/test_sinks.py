"""Webdataset-style shard sink (datasmith_spark/sinks.py)."""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pytest

from datasmith_spark.sinks import assign_shards, read_shard_members, write_shards


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    rows = [
        (f"clip {i} (v2).wav", bytes(rng.integers(0, 256, size=int(sz), dtype=np.uint8)))
        for i, sz in enumerate(rng.integers(2_000, 40_000, size=300))
    ]
    return spark.createDataFrame(rows, "clip_id string, bytes binary").cache(), {
        k: v for k, v in rows
    }


class TestAssignShards:
    def test_shard_sizes_bounded_and_exhaustive(self, spark, corpus):
        df, _ = corpus
        a = assign_shards(df, shard_bytes=100_000, n_buckets=8).toPandas()
        assert len(a) == 300
        by = a.assign(sz=a["bytes"].map(len)).groupby("shard")
        # first-fit on the exclusive prefix sum: every shard except a
        # bucket's last stays under budget + one sample
        sizes = by.sz.sum()
        assert (sizes <= 100_000 + 40_000).all()
        # seq is strictly increasing within each shard (bucket-relative
        # numbering — dense per-bucket, monotone per-shard)
        for _, g in by:
            s = sorted(g.seq)
            assert len(set(s)) == len(s)
        dense = a.groupby(a.shard.str[:4]).seq
        for _, g in dense:
            assert sorted(g) == list(range(len(g)))

    def test_assignment_is_partitioning_invariant(self, spark, corpus):
        df, _ = corpus
        a = (
            assign_shards(df.repartition(13), shard_bytes=100_000)
            .select("clip_id", "shard", "seq")
            .toPandas()
            .sort_values("clip_id")
            .reset_index(drop=True)
        )
        b = (
            assign_shards(df.coalesce(1), shard_bytes=100_000)
            .select("clip_id", "shard", "seq")
            .toPandas()
            .sort_values("clip_id")
            .reset_index(drop=True)
        )
        assert a.equals(b)


class TestWriteShards:
    def test_roundtrip_and_deterministic_manifest(self, spark, corpus, tmp_path):
        df, payloads = corpus
        out1 = str(tmp_path / "s1")
        m1 = write_shards(df, out1, shard_bytes=100_000).toPandas()
        assert m1.n_members.sum() == 300
        # every payload round-trips byte-identically
        seen = {}
        for p in glob.glob(os.path.join(out1, "*.tar")):
            for key, data in read_shard_members(p):
                seen[key] = data
        assert seen == payloads
        # tar files on disk match the manifest digests
        for _, r in m1.iterrows():
            data = open(os.path.join(out1, f"{r.shard}.tar"), "rb").read()
            assert len(data) == r.tar_bytes
            assert hashlib.md5(data).hexdigest() == r.tar_md5
        # second run elsewhere: bit-identical shards (idempotent export)
        out2 = str(tmp_path / "s2")
        m2 = write_shards(df, out2, shard_bytes=100_000).toPandas()
        a = m1.sort_values("shard").reset_index(drop=True)
        b = m2.sort_values("shard").reset_index(drop=True)
        assert a.equals(b)
        # manifest persisted beside the shards
        assert os.path.isdir(os.path.join(out1, "_manifest"))

    def test_oversized_sample_gets_own_shard(self, spark, tmp_path):
        rows = [
            ("big", b"\x07" * 300_000),
            ("small_a", b"\x01" * 10),
            ("small_b", b"\x02" * 10),
        ]
        df = spark.createDataFrame(rows, "clip_id string, bytes binary")
        out = str(tmp_path / "s3")
        m = write_shards(df, out, shard_bytes=100_000, n_buckets=1).toPandas()
        big_shards = [
            r.shard
            for _, r in m.iterrows()
            for k, d in read_shard_members(os.path.join(out, f"{r.shard}.tar"))
            if k == "big"
        ]
        assert len(big_shards) == 1
        # the oversized sample is intact
        got = {
            k: d
            for _, r in m.iterrows()
            for k, d in read_shard_members(os.path.join(out, f"{r.shard}.tar"))
        }
        assert got["big"] == b"\x07" * 300_000
