"""Materialize the naive-PAVA isotonic-calibration oracle as a committed
fixture (fixtures/oracle_isotonic_n{N}.parquet) for q195.

Deliberately a DIFFERENT algorithm from the operator's stack-based /
partition-parallel PAVA: repeated full rescans that pool the first
adjacent violation until none remains (O(n^2), fine at fixture scale).
Both implementations must land on the same blocks because the L2-optimal
monotone fit is unique — so the value check validates the parallel
construction against an independently-coded sequential one.

Input: the committed labels fixture (ppl, keep per clip, q27's ground
truth), ordered by (ppl, clip_id), keep fitted as a NON-INCREASING rate
of ppl. All arithmetic integer-exact ((sum, count) rationals compared by
cross-multiplication).

Usage: python scripts/make_isotonic_fixture.py [n_rows=4000]
"""

from __future__ import annotations

import os
import sys

import pandas as pd

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)


def naive_pava_decreasing(ys: list[int]) -> list[tuple[int, int]]:
    blocks = [(1, int(y)) for y in ys]
    while True:
        for i in range(len(blocks) - 1):
            n1, s1 = blocks[i]
            n2, s2 = blocks[i + 1]
            if s1 * n2 < s2 * n1:  # rate increases -> violation
                blocks[i : i + 2] = [(n1 + n2, s1 + s2)]
                break
        else:
            return blocks


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    labels = pd.read_parquet(
        os.path.join(FIXTURE_DIR, f"oracle_labels_n{n}.parquet")
    )
    sub = labels[labels.ppl.notna() & labels.keep.notna()][
        ["clip_id", "ppl", "keep"]
    ].sort_values(["ppl", "clip_id"], kind="mergesort")
    blocks = naive_pava_decreasing([1 if k else 0 for k in sub.keep])
    # canonical maximal level sets (implementation-independent boundaries)
    canon = []
    for bn, bs in blocks:
        if canon and canon[-1][1] * bn == bs * canon[-1][0]:
            canon[-1][0] += bn
            canon[-1][1] += bs
        else:
            canon.append([bn, bs])
    blocks = [(bn, bs) for bn, bs in canon]
    df = pd.DataFrame(
        {
            "block_id": range(len(blocks)),
            "n": [b[0] for b in blocks],
            "n_pos": [b[1] for b in blocks],
            "rate_milli": [(1000 * b[1]) // b[0] for b in blocks],
        }
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    out = os.path.join(FIXTURE_DIR, f"oracle_isotonic_n{n}.parquet")
    df.to_parquet(out, index=False)
    print(out, len(df), "blocks;", df.n.sum(), "rows pooled")
    print(df.head(10).to_string())


if __name__ == "__main__":
    main()
