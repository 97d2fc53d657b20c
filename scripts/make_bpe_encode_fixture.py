"""Materialize the single-process BPE-encode oracle as a committed parquet
fixture (fixtures/oracle_bpe_encode_n{N}_m{M}.parquet) for q76.

Serial reference: encode the pinned transcripts' word table with the q75
merge table (rank order), count subword tokens weighted by word frequency,
keep the top 50 under the deterministic (n desc, token asc) order. Pure
string/integer computation — host-portable by construction.

Usage: python scripts/make_bpe_encode_fixture.py [n_rows=4000] [n_merges=24]
"""

from __future__ import annotations

import os
import sys
from collections import Counter

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

TOP = 50


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    from datasmith_spark.core.bpe import encode_word
    from scripts.make_bpe_fixture import transcript_word_counts

    merges_fx = pd.read_parquet(
        os.path.join(FIXTURE_DIR, f"oracle_bpe_n{n}_m{m}.parquet")
    )
    merges = [(r["left"], r["right"]) for _, r in merges_fx.iterrows()]
    counts: Counter[str] = Counter()
    for w, freq in transcript_word_counts(n).items():
        for tok in encode_word(w, merges):
            counts[tok] += freq
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP]
    df = pd.DataFrame(
        [(i + 1, t, c) for i, (t, c) in enumerate(top)],
        columns=["rank", "token", "n"],
    )
    df["rank"] = df["rank"].astype("int32")
    df["n"] = df["n"].astype("int64")
    out = os.path.join(FIXTURE_DIR, f"oracle_bpe_encode_n{n}_m{m}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows; head:\n{df.head()}")


if __name__ == "__main__":
    main()
