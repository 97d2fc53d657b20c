"""Byte-pair-encoding tokenizer training — serial reference kernel.

Classic BPE (Sennrich et al. 2016): train on the WORD-FREQUENCY table, not
the raw corpus — the property that makes the distributed version scale
(10^12 documents collapse to a bounded distinct-word table; every merge
round then runs on that table only). Each word is a symbol sequence
(characters + a '</w>' end-of-word marker); each round counts adjacent
symbol pairs weighted by word frequency, merges the most frequent pair
(ties break to the lexicographically smallest (left, right) — a total
order, so training is deterministic), and rewrites the words.

This module is the single-process reference the committed q75 fixture and
the distributed trainer's tests both pin; operators/text_analysis.py
implements the same algorithm as Spark jobs (pair counting = one
aggregation per round over the word table; rewrite = one Arrow-batched
narrow map; driver traffic = ONE argmax row per round).
"""

from __future__ import annotations

EOW = "</w>"


def symbolize(word: str) -> tuple[str, ...]:
    """Initial symbol sequence of a word: characters + end-of-word marker."""
    return tuple(word) + (EOW,)


def merge_seq(seq: tuple[str, ...], left: str, right: str) -> tuple[str, ...]:
    """Apply ONE merge left+right -> leftright, left to right (the standard
    overlap rule: 'aaa' under (a,a) becomes ('aa','a'))."""
    out: list[str] = []
    i = 0
    n = len(seq)
    while i < n:
        if i + 1 < n and seq[i] == left and seq[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)


def pair_counts(words: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    """Adjacent-pair counts over a {symbol-seq: word frequency} table."""
    counts: dict[tuple[str, str], int] = {}
    for seq, freq in words.items():
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def best_pair(counts: dict[tuple[str, str], int]) -> tuple[str, str, int] | None:
    """Most frequent pair; ties -> lexicographically smallest (left, right)."""
    if not counts:
        return None
    (left, right), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return left, right, cnt


def bpe_train(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Train n_merges BPE merges over a {word: count} table.

    Returns [(rank, left, right, pair_count)] with rank starting at 1.
    Stops early when no pair remains (all words fully merged).

    >>> merges = bpe_train({"low": 5, "lower": 2, "lowest": 6}, 3)
    >>> [(m[1], m[2]) for m in merges]
    [('l', 'o'), ('lo', 'w'), ('low', 'e')]
    >>> [m[3] for m in merges]  # 'l o' in all 13 instances; 'low e' in 2+6
    [13, 13, 8]
    """
    words: dict[tuple[str, ...], int] = {}
    for w, c in word_counts.items():
        seq = symbolize(w)
        words[seq] = words.get(seq, 0) + int(c)
    out: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        bp = best_pair(pair_counts(words))
        if bp is None:
            break
        left, right, cnt = bp
        out.append((rank, left, right, cnt))
        nxt: dict[tuple[str, ...], int] = {}
        for seq, freq in words.items():
            m = merge_seq(seq, left, right)
            nxt[m] = nxt.get(m, 0) + freq  # distinct seqs can collide post-merge
        words = nxt
    return out


def encode_word(word: str, merges: list[tuple[str, str]]) -> tuple[str, ...]:
    """Tokenize one word with a trained merge list: apply every merge in
    rank order (the standard BPE encoder — rank order, not greedy-longest).

    >>> ms = [(m[1], m[2]) for m in bpe_train({"low": 5, "lower": 2}, 4)]
    >>> encode_word("lowest", ms)
    ('low', 'e', 's', 't', '</w>')
    >>> encode_word("low", ms)[:1]
    ('low',)
    """
    seq = symbolize(word)
    for left, right in merges:
        seq = merge_seq(seq, left, right)
    return seq
