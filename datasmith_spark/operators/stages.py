"""Arrow-batched UDF stages: decode -> langid -> perplexity -> scrub.

Design: the pipeline is ONE narrow chain. Every stage is a *conditional
enrich* — rows already carrying a drop_stage pass through untouched (the UDF
skips them inside the batch), so the expensive work (audio decode, model
scoring) runs exactly once per surviving row, with no branch/union recompute
and no caching requirement. This is the property that holds at 10^12-clip
scale: no shuffle anywhere in the chain, Python touched only by survivors.

All heavy kernels live in datasmith_spark.core and are shared with the
oracle (bit-identical decisions). Per-row-only math => results invariant to
Arrow batch size and partitioning (SURVEY.md §7.4 risk 1).

Ancestry: batched stateful encoder pattern
(/root/reference/src/datasmith/scrape/build_reports.py:235-246), group/map
UDF boundary (/root/reference/scripts/filter_commits.py:91-117).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core import audio, langid, lm
from ..core import rules as R
from ..core.scrub import count_words, scrub_text

# --------------------------------------------------------------- decode (D)

_DECODE_FIELDS = [
    T.StructField("n_samples", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("clip_rate", T.DoubleType()),
    T.StructField("finite_frac", T.DoubleType()),
    T.StructField("decode_ok", T.BooleanType()),
]


DECODE_FEATURE_COLS = ("n_samples", "rms", "peak", "clip_rate", "finite_frac", "decode_ok")


def decode_features_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-batch decode kernel: add feature columns, drop `bytes`.

    Shared by the transfer path (decode_stage mapInPandas) and the fused
    scan path (operators/scan_decode.py) — one implementation, bit-identical
    features either way. Rows already dropped (drop_stage set) are skipped
    and get null features.
    """
    n = len(pdf)
    ns = np.zeros(n, dtype=np.int64)
    rms = np.zeros(n, dtype=np.float64)
    peak = np.zeros(n, dtype=np.float64)
    clip = np.zeros(n, dtype=np.float64)
    fin = np.zeros(n, dtype=np.float64)
    ok = np.zeros(n, dtype=bool)
    alive = pdf["drop_stage"].isna().to_numpy()
    bufs = pdf["bytes"].to_numpy()
    codecs = pdf["codec"].to_numpy()
    for i in np.flatnonzero(alive):
        pcm = audio.decode(bufs[i], codecs[i])
        ok[i] = pcm is not None
        # integer codecs decode to finite float64 by construction: skip the
        # isfinite scan (bitwise-identical result, audio.pcm_features)
        ns[i], rms[i], peak[i], clip[i], fin[i] = audio.pcm_features(
            pcm, assume_finite=codecs[i] != "float32"
        )
    out = pdf.drop(columns=["bytes"])
    out["n_samples"] = ns
    out["rms"] = rms
    out["peak"] = peak
    out["clip_rate"] = clip
    out["finite_frac"] = fin
    out["decode_ok"] = ok
    # dead rows: feature columns are meaningless -> null them
    dead = ~alive
    if dead.any():
        for c in DECODE_FEATURE_COLS:
            out[c] = out[c].astype(object)
            out.loc[dead, c] = None
    return out


def decode_schema_for(in_schema: T.StructType) -> T.StructType:
    return T.StructType([f for f in in_schema.fields if f.name != "bytes"] + _DECODE_FIELDS)


def decode_epilogue(mapped: DataFrame) -> DataFrame:
    """Native mirror of core.rules.decode_reasons (exclusive when-chain = elif)."""
    alive = F.col("drop_stage").isNull()
    reason = (
        F.when(~F.coalesce(F.col("decode_ok"), F.lit(False)), F.lit("decode_error"))
        .when(F.col("finite_frac") < R.FINITE_FRAC_MIN, F.lit("nonfinite_audio"))
        .when(F.col("peak") > R.PEAK_MAX, F.lit("bad_amplitude"))
        .when(F.col("rms") < R.RMS_MIN, F.lit("silence"))
    )
    return (
        mapped.withColumn("_dr", F.when(alive, reason))
        .withColumns({
            "drop_stage": F.when(F.col("_dr").isNotNull(), F.lit(R.STAGE_DECODE)).otherwise(F.col("drop_stage")),
            "drop_reasons": F.when(F.col("_dr").isNotNull(), F.array(F.col("_dr"))).otherwise(F.col("drop_reasons")),
        })
        .drop("_dr")
    )


def decode_stage(df: DataFrame) -> DataFrame:
    """mapInPandas: decode audio of still-alive rows into features.

    Consumes the `bytes` column (dropped from the output — after this stage
    the rows are ~100 bytes, so downstream stages are cheap to move).
    """
    out_schema = decode_schema_for(df.schema)
    out_cols = [f.name for f in out_schema.fields]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_features_pdf(pdf)[out_cols]

    return decode_epilogue(df.mapInPandas(_decode, schema=out_schema))


# --------------------------------------------------------------- langid (L)

_LID_SCHEMA = T.StructType(
    [T.StructField("lang", T.StringType()), T.StructField("lang_prob", T.DoubleType())]
)


@F.pandas_udf(_LID_SCHEMA)
def _langid_udf(transcript: pd.Series, drop_stage: pd.Series) -> pd.DataFrame:
    m = langid.model()
    langs: list[str | None] = [None] * len(transcript)
    probs: list[float | None] = [None] * len(transcript)
    alive = np.flatnonzero(drop_stage.isna().to_numpy())
    texts = transcript.to_numpy()
    if alive.size:
        # one batched score per Arrow batch (bit-identical to predict_one)
        b_langs, b_probs = m.predict_batch([texts[i] for i in alive])
        for j, i in enumerate(alive):
            langs[i], probs[i] = b_langs[j], b_probs[j]
    return pd.DataFrame({"lang": langs, "lang_prob": probs})


def langid_stage(df: DataFrame) -> DataFrame:
    alive = F.col("drop_stage").isNull()
    out = df.withColumn("_lid", _langid_udf(F.col("transcript"), F.col("drop_stage")))
    out = out.select("*", F.col("_lid.lang").alias("lang"), F.col("_lid.lang_prob").alias("lang_prob")).drop("_lid")
    failed = alive & (F.col("lang").isNull() | (F.col("lang_prob") < R.LANG_PROB_MIN))
    # single withColumns: both updates must see the PRE-update drop_stage
    return out.withColumns({
        "drop_stage": F.when(failed, F.lit(R.STAGE_LANGID)).otherwise(F.col("drop_stage")),
        "drop_reasons": F.when(failed, F.array(F.lit("lang_confidence"))).otherwise(F.col("drop_reasons")),
    })


# ----------------------------------------------------------- perplexity (P)

@F.pandas_udf(T.DoubleType())
def _ppl_udf(transcript: pd.Series, lang: pd.Series, drop_stage: pd.Series) -> pd.Series:
    m = lm.model()
    out: list[float | None] = [None] * len(transcript)
    alive = np.flatnonzero(drop_stage.isna().to_numpy())
    texts = transcript.to_numpy()
    langs = lang.to_numpy()
    if alive.size:
        # one batched score per Arrow batch (bit-identical to ppl_one)
        b = m.ppl_batch([texts[i] for i in alive], [langs[i] for i in alive])
        for j, i in enumerate(alive):
            out[i] = float(b[j])
    return pd.Series(out, dtype="float64")


def ppl_stage(df: DataFrame) -> DataFrame:
    bands = lm.model().bands
    lo = F.create_map(*[x for lang, (l, _) in bands.items() for x in (F.lit(lang), F.lit(l))])
    hi = F.create_map(*[x for lang, (_, h) in bands.items() for x in (F.lit(lang), F.lit(h))])
    out = df.withColumn("ppl", _ppl_udf(F.col("transcript"), F.col("lang"), F.col("drop_stage")))
    alive = F.col("drop_stage").isNull()
    in_band = (
        ~F.isnan(F.col("ppl"))
        & (F.col("ppl") != float("inf"))
        & (F.col("ppl") >= lo[F.col("lang")])
        & (F.col("ppl") <= hi[F.col("lang")])
    )
    failed = alive & ~F.coalesce(in_band, F.lit(False))
    return out.withColumns({
        "drop_stage": F.when(failed, F.lit(R.STAGE_PPL)).otherwise(F.col("drop_stage")),
        "drop_reasons": F.when(failed, F.array(F.lit("ppl_outlier"))).otherwise(F.col("drop_reasons")),
    })


# ---------------------------------------------------------------- scrub (S)

_SCRUB_SCHEMA = T.StructType(
    [
        T.StructField("scrubbed_transcript", T.StringType()),
        T.StructField("pii_count", T.IntegerType()),
        T.StructField("tox_count", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
    ]
)


@F.pandas_udf(_SCRUB_SCHEMA)
def _scrub_udf(transcript: pd.Series, drop_stage: pd.Series) -> pd.DataFrame:
    n = len(transcript)
    scrubbed: list[str | None] = [None] * n
    pii = np.full(n, np.nan)
    tox = np.full(n, np.nan)
    words = np.full(n, np.nan)
    alive = drop_stage.isna().to_numpy()
    texts = transcript.to_numpy()
    for i in np.flatnonzero(alive):
        s, p, x = scrub_text(texts[i])
        scrubbed[i] = s
        pii[i], tox[i] = p, x
        words[i] = count_words(texts[i])
    return pd.DataFrame(
        {
            "scrubbed_transcript": scrubbed,
            "pii_count": pd.array(pii, dtype="Int32"),
            "tox_count": pd.array(tox, dtype="Int32"),
            "n_words": pd.array(words, dtype="Int32"),
        }
    )


def scrub_stage(df: DataFrame) -> DataFrame:
    out = df.withColumn("_s", _scrub_udf(F.col("transcript"), F.col("drop_stage")))
    out = out.select(
        "*",
        F.col("_s.scrubbed_transcript").alias("scrubbed_transcript"),
        F.col("_s.pii_count").alias("pii_count"),
        F.col("_s.tox_count").alias("tox_count"),
        F.col("_s.n_words").alias("n_words"),
    ).drop("_s")
    alive = F.col("drop_stage").isNull()
    toxic = (
        alive
        & (F.col("n_words") > 0)
        & (F.col("tox_count").cast("double") / F.col("n_words").cast("double") > R.TOX_RATIO_MAX)
    )
    return out.withColumns({
        "drop_stage": F.when(toxic, F.lit(R.STAGE_SCRUB)).otherwise(F.col("drop_stage")),
        "drop_reasons": F.when(toxic, F.array(F.lit("toxicity"))).otherwise(F.col("drop_reasons")),
    })
