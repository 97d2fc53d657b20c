"""Materialize the single-process BPE-training oracle as a committed parquet
fixture (fixtures/oracle_bpe_n{N}_m{M}.parquet) for q75.

The serial reference trainer (core/bpe.bpe_train) runs over the word-count
table of the pinned synthetic clips' transcripts — the same corpus the
distributed trainer (operators/bpe_train.py) reads via the clips cache. BPE
training is pure string/integer computation (no floats anywhere), so the
fixture is host-portable by construction; the fixture-honesty pytest
retrains a prefix and asserts equality.

Usage: python scripts/make_bpe_fixture.py [n_rows=4000] [n_merges=24]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)


def transcript_word_counts(n: int) -> dict[str, int]:
    """Word-frequency table of the pinned clips' transcripts, tokenized the
    engine-pinned way (split on whitespace runs after trim — the same
    semantics as operators/text_analysis.tokens_col on this ASCII corpus)."""
    from datasmith_spark import datagen

    wc: Counter[str] = Counter()
    for i in range(n):
        t = datagen.gen_row(i)["transcript"]
        if not t:
            continue
        for w in re.split(r"\s+", t.strip()):
            if w:
                wc[w] += 1
    return dict(wc)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    from datasmith_spark.core.bpe import bpe_train

    merges = bpe_train(transcript_word_counts(n), m)
    df = pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])
    df["rank"] = df["rank"].astype("int32")
    df["pair_count"] = df["pair_count"].astype("int64")
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    out = os.path.join(FIXTURE_DIR, f"oracle_bpe_n{n}_m{m}.parquet")
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} merges; first 5:\n{df.head()}")


if __name__ == "__main__":
    main()
