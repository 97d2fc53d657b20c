"""Data-layout operators — z-order (Morton) clustering keys.

Multi-dimensional scan pruning at 100 TB hinges on layout: range-
partitioning by a single column prunes one predicate dimension only,
while sorting by the bit-interleaved Morton code of two columns keeps
BOTH dimensions' locality, so min/max file statistics prune on either
predicate (the technique behind Delta/Iceberg Z-ORDER).

The 16-bit interleave uses the standard magic-mask bit-spreading
(4 shift-or-mask steps per axis, no loop over bits), expressed with
native Column ops so it stays in whole-stage codegen — and the SAME
expression is emitted as SQL text for the DuckDB oracle, so q110
value-checks the key bit-for-bit. Inputs are masked to 16 bits; the
key is a non-negative 32-bit value in a BIGINT."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def _spread(c: Column) -> Column:
    c = c.bitwiseAND(F.lit(0xFFFF))
    for sh, mask in _STEPS:
        c = (c.bitwiseOR(F.shiftleft(c, sh))).bitwiseAND(F.lit(mask))
    return c


def zorder_key(x: Column, y: Column) -> Column:
    """32-bit Morton code of the low 16 bits of integer columns x, y
    (x in even bit positions, y in odd)."""
    return _spread(x).bitwiseOR(F.shiftleft(_spread(y), 1))


def zorder_key_sql(x: str, y: str) -> str:
    """The identical computation as a SQL scalar expression (oracle use)."""

    def spread(e: str) -> str:
        e = f"({e} & 65535)"
        for sh, mask in _STEPS:
            e = f"((({e} | ({e} << {sh}))) & {mask})"
        return e

    return f"({spread(x)} | ({spread(y)} << 1))"


def zorder_layout(
    df: DataFrame, x_col: str, y_col: str, n_files: int = 256
) -> DataFrame:
    """Attach `zkey` and range-repartition + sort by it — the write-side
    layout pass: each output file covers a compact Morton range, so
    min/max stats prune on either dimension's predicate."""
    keyed = df.withColumn("zkey", zorder_key(F.col(x_col), F.col(y_col)))
    return keyed.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey")
