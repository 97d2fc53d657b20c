"""Stage R: heuristic quality rules as native Column expressions.

Pure Catalyst/codegen — no Python in the hot path. Built from the SAME
constants as the oracle kernel (datasmith_spark/core/rules.py); every
predicate mirrors the python evaluation exactly (same operation order, same
strict inequalities, double arithmetic in the same association), verified
row-for-row by tests/test_rules.py.

Ancestry: boolean-mask filter with null-hostile defaults
(/root/reference/src/datasmith/scrape/filter_dashboards.py:113-121) and the
regex path predicate (/root/reference/scripts/filter_commits.py:46-81).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import rules as R
from ..core.audio import ITEMSIZE

_KNOWN_CODECS = list(ITEMSIZE)


def _itemsize_col(codec: Column) -> Column:
    c = F.when(codec == "pcm16", F.lit(2)).when(codec == "float32", F.lit(4))
    return c.when(codec.isin(["pcm8", "mulaw", "alaw"]), F.lit(1))  # else null


def rule_reasons_col(
    codec: Column, sr_hz: Column, dur_ms: Column, raw: Column, transcript: Column
) -> Column:
    """array<string> of stage-R drop reasons (empty array => row survives).

    Reason order matches core.rules.rule_reasons exactly.
    """
    itemsize = _itemsize_col(codec)
    known = F.coalesce(codec.isin(_KNOWN_CODECS), F.lit(False))
    blen = F.length(raw)  # byte length of the binary column

    unknown_codec = ~known
    empty_audio = raw.isNull() | (blen == 0)
    misaligned = known & raw.isNotNull() & (blen > 0) & (blen % itemsize != 0)

    sr_ok = sr_hz.isNotNull() & sr_hz.isin(list(R.VALID_SR))
    bad_sr = ~F.coalesce(sr_ok, F.lit(False))

    dur_in_range = dur_ms.isNotNull() & (dur_ms >= R.DUR_MIN_MS) & (dur_ms <= R.DUR_MAX_MS)
    bad_duration = ~F.coalesce(dur_in_range, F.lit(False))
    # est_ms computed exactly as python: (blen / itemsize) / sr * 1000.0
    est_ms = blen.cast("double") / itemsize.cast("double") / sr_hz.cast("double") * F.lit(1000.0)
    dur_mismatch = (
        dur_in_range
        & known
        & raw.isNotNull()
        & (blen > 0)
        & (blen % itemsize == 0)
        & sr_ok
        & (F.abs(est_ms - dur_ms.cast("double")) > F.lit(R.DUR_REL_TOL) * dur_ms.cast("double"))
    )

    t = F.coalesce(transcript, F.lit(""))
    stripped = F.trim(t)
    empty_transcript = stripped == ""
    n_chars = F.length(t).cast("double")
    cps = n_chars / (dur_ms.cast("double") / F.lit(1000.0))
    len_ratio = (
        ~empty_transcript
        & dur_ms.isNotNull()
        & (dur_ms > 0)
        & ((cps < R.CPS_MIN) | (cps > R.CPS_MAX))
    )

    words = F.split(stripped, r"\s+")
    n_words = F.size(words)
    rep = repetition_score_col(words)
    repetition = ~empty_transcript & (n_words >= R.REP_MIN_WORDS) & (rep > R.REP_MATCH_MAX)

    sym = F.regexp_count(t, F.lit(R.SYMBOL_PATTERN_SQL)).cast("double")
    symbol_noise = ~empty_transcript & (n_chars > 0) & (sym / n_chars > R.SYMBOL_DENSITY_MAX)

    # filter(nulls) keeps python append order
    return F.filter(
        F.array(
            F.when(unknown_codec, F.lit("unknown_codec")),
            F.when(empty_audio, F.lit("empty_audio")).when(misaligned, F.lit("misaligned_audio")),
            F.when(bad_sr, F.lit("bad_sr")),
            F.when(bad_duration, F.lit("bad_duration")).when(dur_mismatch, F.lit("dur_mismatch")),
            F.when(empty_transcript, F.lit("empty_transcript")),
            F.when(len_ratio, F.lit("len_ratio")),
            F.when(repetition, F.lit("repetition")),
            F.when(symbol_noise, F.lit("symbol_noise")),
        ),
        lambda x: x.isNotNull(),
    )


def repetition_score_col(words: Column) -> Column:
    """max over lag p in [1, REP_MAX_LAG] of mean(words[i] == words[i-p]).

    Native mirror of core.rules.repetition_score: zip_with over two slices of
    the word array, sum of matches / (n - p).
    """
    n = F.size(words)
    scores = []
    for p in range(1, R.REP_MAX_LAG + 1):
        cnt = F.aggregate(
            F.zip_with(
                F.slice(words, F.lit(1), n - p),
                F.slice(words, F.lit(1 + p), n - p),
                lambda a, b: F.when(a == b, F.lit(1)).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        scores.append(
            F.when(n - p > 0, cnt.cast("double") / (n - p).cast("double")).otherwise(F.lit(0.0))
        )
    return F.greatest(*scores)


def with_rule_stage(df, n_parts: int):
    """Add part_id + stage-R columns (drop_stage / drop_reasons) to clips."""
    reasons = rule_reasons_col(
        F.col("codec"), F.col("sr_hz"), F.col("dur_ms"), F.col("bytes"), F.col("transcript")
    )
    return (
        df.withColumn("part_id", F.pmod(F.crc32(F.col("clip_id").cast("binary")), F.lit(n_parts)).cast("int"))
        .withColumn("_r", reasons)
        .withColumn("drop_stage", F.when(F.size("_r") > 0, F.lit(R.STAGE_RULES)))
        .withColumn("drop_reasons", F.when(F.size("_r") > 0, F.col("_r")).otherwise(F.array()))
        .drop("_r")
    )
