"""Sharded training-data export: size-balanced tar shards + manifest.

The sink a training pipeline actually feeds from (the webdataset
convention): the corpus is packed into tar shards of a target byte size,
each member pair `<seq>.id` / `<seq>.bin` carrying one sample, plus a
manifest table recording every shard's path, member count, byte size, and
content digest. Data loaders then stream shards sequentially — the I/O
pattern object stores and disks like — instead of issuing one random read
per sample.

Everything is DETERMINISTIC so re-runs (and speculative task retries)
produce bit-identical shards:
  * Sample order is the engine's seedless shuffle convention — md5 of the
    sample key (q45/q49/q51 precedent) — so shard contents do not depend
    on input partitioning.
  * Shard assignment is relational: samples hash into `n_buckets`
    independent buckets by md5 prefix; within a bucket, a window
    prefix-sum of payload sizes in md5 order is divided by the byte
    budget (the q49 sequence-packing construction applied to bytes). No
    global total order, no single-partition window: each bucket windows
    independently, so the assignment scales to 10^12 samples with one
    hash exchange.
  * Tar bytes are normalized: mtime=0, uid/gid=0, no user/group names,
    USTAR format, members in md5 order — so the manifest's tar_md5 is
    reproducible across hosts and runs.

Reference ancestry: the reference persists blobs through its KV cache
(/root/reference/src/datasmith/utils.py:85-119) one object per key; this
sink is the web-scale packaging of the same payloads for sequential-read
training consumption.
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

MANIFEST_DDL = (
    "shard string, n_members int, tar_bytes bigint, tar_md5 string"
)


def assign_shards(
    df: DataFrame,
    key_col: str = "clip_id",
    payload_col: str = "bytes",
    shard_bytes: int = 1 << 20,
    n_buckets: int = 64,
) -> DataFrame:
    """Relational shard assignment: adds (shard, seq) to every row.

    shard = f"{bucket:04x}-{local:05d}" where bucket is the first 16 bits
    of md5(key) and local = (prefix-sum of payload sizes in md5 order,
    exclusive) DIV shard_bytes within the bucket. seq is the row's
    position in the BUCKET's md5 order — bucket-relative, not
    shard-relative, so no second window/exchange is needed; within a
    shard seq is strictly increasing, which is all the member naming
    requires. A sample larger than shard_bytes gets a shard of its own
    (first-fit never splits a sample)."""
    h = F.md5(F.col(key_col).cast("string"))
    b = F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % n_buckets
    sz = F.length(F.col(payload_col)).cast("bigint")
    w = Window.partitionBy("_bucket").orderBy(F.col("_h").asc(), F.col(key_col).asc())
    out = (
        df.withColumn("_h", h)
        .withColumn("_bucket", b)
        .withColumn("_sz", sz)
        .withColumn(
            "_off", F.coalesce(F.sum("_sz").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
        )
        .withColumn("_local", F.expr(f"_off DIV {int(shard_bytes)}").cast("int"))
        .withColumn(
            "shard",
            F.concat(
                F.lpad(F.conv(F.col("_bucket").cast("string"), 10, 16), 4, "0"),
                F.lit("-"),
                F.lpad(F.col("_local").cast("string"), 5, "0"),
            ),
        )
        .withColumn(
            "seq",
            (F.row_number().over(w) - 1).cast("int"),
        )
        .drop("_h", "_bucket", "_sz", "_off", "_local")
    )
    return out


def _tar_shard(rows: list[tuple[str, bytes, int]]) -> bytes:
    """Deterministic tar bytes for one shard: rows are (key, payload, seq),
    emitted in seq order as `<seq>.id` (utf-8 key) + `<seq>.bin`."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tar:
        for key, payload, seq in sorted(rows, key=lambda r: r[2]):
            for suffix, data in ((".id", key.encode()), (".bin", bytes(payload or b""))):
                info = tarfile.TarInfo(name=f"{seq:08d}{suffix}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def write_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str = "clip_id",
    payload_col: str = "bytes",
    shard_bytes: int = 1 << 20,
    n_buckets: int = 64,
) -> DataFrame:
    """Write the corpus as webdataset-style tar shards under out_dir and
    return the manifest DataFrame (shard, n_members, tar_bytes, tar_md5),
    which is also persisted as parquet at out_dir/_manifest.

    One applyInPandas group per shard builds the tar in memory (bounded by
    shard_bytes + tar overhead) and writes it atomically (tmp + rename).
    Idempotent: re-running over the same input produces byte-identical
    shards, so a retry that overwrites is harmless."""
    os.makedirs(out_dir, exist_ok=True)
    assigned = assign_shards(
        df, key_col=key_col, payload_col=payload_col,
        shard_bytes=shard_bytes, n_buckets=n_buckets,
    ).select(
        F.col(key_col).cast("string").alias("_key"),
        F.col(payload_col).alias("_payload"),
        "shard",
        "seq",
    )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = str(pdf["shard"].iloc[0])
        data = _tar_shard(
            list(zip(pdf["_key"], pdf["_payload"], (int(s) for s in pdf["seq"])))
        )
        path = os.path.join(out_dir, f"{shard}.tar")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_members": [len(pdf)],
                "tar_bytes": [len(data)],
                "tar_md5": [hashlib.md5(data).hexdigest()],
            }
        )

    manifest = assigned.groupBy("shard").applyInPandas(_write, schema=MANIFEST_DDL)
    # materialize (runs the writes), then persist the manifest beside the shards
    manifest.write.mode("overwrite").parquet(os.path.join(out_dir, "_manifest"))
    return manifest.sparkSession.read.parquet(os.path.join(out_dir, "_manifest"))


def read_shard_members(path: str) -> Iterator[tuple[str, bytes]]:
    """(key, payload) pairs from one shard file, in member order — the
    loader-side contract (and the tests' round-trip check)."""
    with tarfile.open(path, mode="r") as tar:
        pending_key: str | None = None
        for m in tar.getmembers():
            data = tar.extractfile(m).read()
            if m.name.endswith(".id"):
                pending_key = data.decode()
            else:
                yield pending_key, data
