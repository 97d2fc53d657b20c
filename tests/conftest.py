"""Shared fixtures: one SparkSession + cached deterministic clips/oracle data.

The clips table and oracle labels are pure functions of the code (seed=42),
so they are cached under .data/test_cache keyed by a fingerprint of the
generating modules — edits to datagen/core auto-invalidate the cache.
"""

from __future__ import annotations

import hashlib
import os
import pathlib

import pandas as pd
import pytest

REPO = pathlib.Path("/root/repo")
N_TEST = 2000
N_PARTS = 16


def _fingerprint() -> str:
    h = hashlib.sha256()
    pkg = REPO / "datasmith_spark"
    for p in sorted(list((pkg / "core").glob("*.py")) + [pkg / "datagen.py", pkg / "oracle.py"]):
        h.update(p.read_bytes())
    return h.hexdigest()[:12]


def cache_dir() -> pathlib.Path:
    d = REPO / ".data" / "test_cache" / _fingerprint()
    d.mkdir(parents=True, exist_ok=True)
    return d


@pytest.fixture(scope="session")
def spark():
    from datasmith_spark.session import get_spark

    s = get_spark(app="datasmith-tests", cores=8, driver_mem="16g")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def clips_path(spark) -> str:
    """Deterministic clips table (N_TEST rows) as parquet, cached."""
    p = cache_dir() / "clips"
    if not (p / "_SUCCESS").exists():
        from datasmith_spark import datagen

        datagen.clips_df(spark, N_TEST, n_partitions=8).write.mode("overwrite").parquet(str(p))
    return str(p)


@pytest.fixture(scope="session")
def clips_pdf(clips_path, spark) -> pd.DataFrame:
    return (
        spark.read.parquet(clips_path)
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="session")
def oracle_pdf(clips_pdf) -> pd.DataFrame:
    """Single-process reference labels, cached."""
    p = cache_dir() / "oracle_labels.parquet"
    if p.exists():
        return pd.read_parquet(p)
    from datasmith_spark import oracle

    df = oracle.oracle_labels(clips_pdf, n_parts=N_PARTS)
    df.to_parquet(p, index=False)
    return df


def assert_frames_exact(lab: pd.DataFrame, ora: pd.DataFrame) -> None:
    """Column-by-column exact comparison (floats bitwise, arrays elementwise)."""
    import numpy as np

    assert len(lab) == len(ora)
    for c in ora.columns:
        a, b = lab[c], ora[c]
        if c == "drop_reasons":
            bad = [
                i
                for i, (x, y) in enumerate(zip(a, b))
                if list(x if x is not None else []) != list(y if y is not None else [])
            ]
            assert not bad, f"drop_reasons mismatch rows {bad[:5]}"
        elif a.dtype.kind == "f" or b.dtype.kind == "f":
            av = a.to_numpy(dtype=float)
            bv = b.to_numpy(dtype=float)
            ok = (np.isnan(av) & np.isnan(bv)) | (av == bv)
            assert ok.all(), f"{c}: {int((~ok).sum())} float mismatches"
        else:
            ok = a.fillna("<null>").astype(str) == b.fillna("<null>").astype(str)
            assert ok.all(), f"{c}: {int((~ok).sum())} mismatches"
