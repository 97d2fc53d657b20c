"""Parallel PAVA isotonic calibration (q195): equality with a naive
sequential fit, partition invariance, monotonicity/mass invariants."""

from __future__ import annotations

import numpy as np

from datasmith_spark.operators.calibration import (
    isotonic_calibration,
    merge_equal_rates,
    pava_merge,
)


def _naive_blocks(ys):
    """First-violation rescan PAVA + level-set canonicalization —
    independent of the operator's stack/parallel construction."""
    blocks = [(1, int(y)) for y in ys]
    while True:
        for i in range(len(blocks) - 1):
            n1, s1 = blocks[i]
            n2, s2 = blocks[i + 1]
            if s1 * n2 < s2 * n1:
                blocks[i : i + 2] = [(n1 + n2, s1 + s2)]
                break
        else:
            break
    out = []
    for n, s in blocks:
        if out and out[-1][1] * n == s * out[-1][0]:
            out[-1] = (out[-1][0] + n, out[-1][1] + s)
        else:
            out.append((n, s))
    return out


def _pairs(spark, ys):
    rows = [(float(i), int(y), f"r{i:06d}") for i, y in enumerate(ys)]
    return spark.createDataFrame(rows, "x double, y long, id string")


def test_parallel_equals_naive_on_random_sequences(spark):
    rng = np.random.default_rng(13)
    for trial in range(4):
        ys = (rng.random(200) < 0.7 - 0.4 * np.linspace(0, 1, 200)).astype(int)
        want = _naive_blocks(ys)
        got = [
            (r.n, r.n_pos)
            for r in isotonic_calibration(_pairs(spark, ys), n_parts=5)
            .orderBy("block_id")
            .collect()
        ]
        assert got == want, trial


def test_partition_count_cannot_move_blocks(spark):
    rng = np.random.default_rng(3)
    ys = (rng.random(150) < 0.5).astype(int)
    outs = []
    for parts in (1, 7):
        outs.append(
            [
                (r.n, r.n_pos, r.rate_milli)
                for r in isotonic_calibration(_pairs(spark, ys), n_parts=parts)
                .orderBy("block_id")
                .collect()
            ]
        )
    assert outs[0] == outs[1]


def test_monotone_and_mass_conserving(spark):
    rng = np.random.default_rng(99)
    ys = (rng.random(300) < 0.6).astype(int)
    out = (
        isotonic_calibration(_pairs(spark, ys), n_parts=6)
        .orderBy("block_id")
        .collect()
    )
    assert sum(r.n for r in out) == 300
    assert sum(r.n_pos for r in out) == int(ys.sum())
    rates = [(r.n_pos, r.n) for r in out]
    for (s1, n1), (s2, n2) in zip(rates, rates[1:]):
        assert s1 * n2 > s2 * n1  # strictly decreasing after level-set merge


def test_kernel_units():
    assert pava_merge([(1, 1), (1, 0)]) == [(1, 1), (1, 0)]  # no violation
    assert pava_merge([(1, 0), (1, 1)]) == [(2, 1)]          # pooled
    assert merge_equal_rates([(1, 1), (2, 2), (1, 0)]) == [(3, 3), (1, 0)]
