"""Materialize the single-process per-language BPE-fertility oracle as a
committed parquet fixture (fixtures/oracle_bpe_fertility_n{N}_m{M}.parquet)
for q186.

Independent pandas/python derivation over two already-value-checked
artifacts: the oracle labels fixture (lang + scrubbed transcript per clip,
q27's ground truth) and the q75 merge-table fixture. Tokenization mirrors
the engine's shared rule (trim, split on whitespace runs, drop empties);
token counts include the </w> end-of-word marker; all sums exact integers.

Usage: python scripts/make_bpe_fertility_fixture.py [n_rows=4000] [merges=24]
"""

from __future__ import annotations

import os
import re
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)


def main() -> None:
    from datasmith_spark.core.bpe import encode_word

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    labels = pd.read_parquet(
        os.path.join(FIXTURE_DIR, f"oracle_labels_n{n}.parquet")
    )
    merges_fx = pd.read_parquet(os.path.join(FIXTURE_DIR, f"oracle_bpe_n{n}_m{m}.parquet"))
    merges = [(r["left"], r["right"]) for _, r in merges_fx.iterrows()]

    counts: dict[tuple[str, str], int] = {}
    for lang, text in zip(labels["lang"], labels["scrubbed_transcript"]):
        if text is None or (isinstance(text, float) and pd.isna(text)):
            continue
        for w in re.split(r"\s+", str(text).strip()):
            if w:
                counts[(lang, w)] = counts.get((lang, w), 0) + 1

    enc_cache: dict[str, int] = {}
    agg: dict[str, list[int]] = {}
    for (lang, w), freq in counts.items():
        if w not in enc_cache:
            enc_cache[w] = len(encode_word(w, merges))
        a = agg.setdefault(lang, [0, 0, 0])
        a[0] += freq
        a[1] += freq * enc_cache[w]
        a[2] += freq * len(w)

    rows = [
        {
            "lang": lang,
            "n_words": a[0],
            "n_tokens": a[1],
            "n_chars": a[2],
            "fertility_milli": (1000 * a[1]) // a[2],
        }
        for lang, a in sorted(agg.items())
    ]
    df = pd.DataFrame(rows)
    for c in ("n_words", "n_tokens", "n_chars", "fertility_milli"):
        df[c] = df[c].astype("int64")
    out = os.path.join(FIXTURE_DIR, f"oracle_bpe_fertility_n{n}_m{m}.parquet")
    df.to_parquet(out, index=False)
    print(out, len(df), "langs")
    print(df.to_string())


if __name__ == "__main__":
    main()
