"""Text-analysis operators over a document/transcript table.

All-native Column expressions (whole-stage codegen; regexes chosen to behave
identically under Java regex and RE2 so DuckDB oracles can mirror them).

These are the documents-table counterparts of the clips pipeline's transcript
stages: token counting, quality scoring, marker-based classification and
content fingerprinting for a training-data curation pipeline at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

STOPWORD_PATTERN = r"\b(the|a|and|of|to|in)\b"
SYMBOL_PATTERN = r"[^a-z0-9 ]"

# marker-token classes for the SQL-expressible argmax classifier
CLASS_MARKERS = {
    "db": r"\b(table|row|column|index|key)\b",
    "stream": r"\b(stream|batch|window|event)\b",
    "compute": r"\b(scan|hash|sort|merge|join)\b",
}


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-language token statistics (F12-family tokenizer counting,
    /root/reference/src/datasmith/scrape/build_reports.py:235-246)."""
    n_tok = F.size(tokens_col(F.col("text")))
    return (
        docs.withColumn("n_tokens", n_tok)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


def quality_flags(docs: DataFrame) -> DataFrame:
    """Per-language heuristic quality-rule hit counts (the documents-table
    mirror of the clips rules stage; ancestry filter_dashboards.py:113-121)."""
    length = F.length("text").cast("double")
    n_tok = F.size(tokens_col(F.col("text"))).cast("double")
    sym_ratio = F.regexp_count(F.col("text"), F.lit(SYMBOL_PATTERN)).cast("double") / length
    stop_ratio = F.regexp_count(F.col("text"), F.lit(STOPWORD_PATTERN)).cast("double") / n_tok
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum((length < 100).cast("long")).alias("n_short"),
        F.sum((sym_ratio > 0.05).cast("long")).alias("n_symbolic"),
        F.sum((stop_ratio < 0.02).cast("long")).alias("n_low_stopword"),
    )


def classify_argmax(docs: DataFrame) -> DataFrame:
    """Marker-token argmax classifier (fixed tie-break precedence db >
    stream > compute) — the SQL-expressible skeleton of langid scoring."""
    s = {k: F.regexp_count(F.col("text"), F.lit(p)) for k, p in CLASS_MARKERS.items()}
    pred = (
        F.when((s["db"] >= s["stream"]) & (s["db"] >= s["compute"]), F.lit("db"))
        .when(s["stream"] >= s["compute"], F.lit("stream"))
        .otherwise(F.lit("compute"))
    )
    return docs.withColumn("pred", pred).groupBy("lang", "pred").agg(F.count("*").alias("n"))


def fingerprint_col(text: Column) -> Column:
    """md5 over whitespace-normalized lowercase text — the exact-dedup key.

    md5 hex is identical across Spark and DuckDB, so this fingerprint is
    oracle-checkable end to end.
    """
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm.cast("binary"))


def winnow_fingerprints(docs: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """MOSS-style winnowing document fingerprints (rolling k-gram + window min).

    words -> k-gram strings -> md5 (hex, engine-portable) -> sliding window
    of w hashes -> per-window min -> DISTINCT (doc_id, fingerprint). All
    native exprs; the window min runs inside each doc's partition (map-side
    after a hash repartition on doc_id), so the op scales as a single
    shuffle-by-doc no matter the corpus size.

    Ancestry: content-key dedup (seen-set of (typ, url) pairs,
    /root/reference/src/datasmith/scrape/code_coverage.py:83-88) upgraded to
    locality-sensitive document fingerprints.
    """
    # fully-native k-gram hashing (no HOF lambdas — an interpreted
    # transform(sequence, slice) re-evaluated split(text) per element):
    # zip k shifted slices of the materialized words array, then md5 the
    # concatenated struct fields. posexplode keeps the k-gram position for
    # the winnowing window.
    words = F.col("_w")
    n_kg = F.size(words) - (k - 1)
    zipped = F.arrays_zip(*[F.slice(words, 1 + j, n_kg) for j in range(k)])
    # guard: slice with non-positive length errors; short docs get no k-gram
    kgrams = F.when(n_kg >= 1, zipped).otherwise(
        F.array().cast("array<struct<" + ",".join(f"`{j}`:string" for j in range(k)) + ">>")
    )
    g = (
        docs.withColumn("_w", F.split(F.trim(F.col("text")), r"\s+"))
        .select("doc_id", F.posexplode(kgrams).alias("pos", "_z"))
        .select(
            "doc_id",
            "pos",
            F.md5(
                F.concat_ws(" ", *[F.col("_z").getField(str(j)) for j in range(k)]).cast("binary")
            ).alias("h"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        g.withColumn("fp", F.min("h").over(win))
        .select("doc_id", "fp")
        .distinct()
    )


def fingerprint_pairs(
    docs: DataFrame, k: int = 3, w: int = 4, min_shared: int = 10, cap: int | None = None
) -> DataFrame:
    """Near-duplicate candidates: doc pairs sharing >= min_shared winnowing
    fingerprints (equi-join on fingerprint, count per pair).

    The fingerprint join is hot-key-capped (operators/pairs.py): a
    boilerplate fingerprint shared by m > cap documents contributes star
    pairs (min-id representative, member) instead of m^2 rows — such
    fingerprints carry no discriminative signal anyway."""
    from .pairs import capped_key_pairs

    fp = winnow_fingerprints(docs, k, w)
    return (
        capped_key_pairs(fp, "fp", "doc_id", cap)
        .groupBy(F.col("a").alias("doc_a"), F.col("b").alias("doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def gopher_quality(docs: DataFrame) -> DataFrame:
    """Per-document Gopher-style quality rules (Rae et al. 2021 §A1.1.1 shape,
    thresholds tuned to the synthetic corpus): word-count bounds, mean-word-
    length bounds, minimum stopword hits, symbol-density cap, and a
    duplicate-word (repetition) cap. The documents-table mirror of the clips
    pipeline's rules stage, per-doc rather than per-lang (q18's aggregate).

    Every emitted metric is an integer and the keep rule uses only integer
    cross-multiplied compares (mean word length in [3, 10] is
    3*n_words <= sum_word_len <= 10*n_words), so the DuckDB oracle re-derives
    the ENTIRE computation — no float ratios, no rounding convention.

    At scale: embarrassingly parallel narrow map over native Column
    expressions (whole-stage codegen; split/aggregate/regexp_count are all
    JVM-side), no shuffle, predicate-pushdown friendly.
    """
    w = tokens_col(F.col("text"))
    n_words = F.size(w)
    sum_wl = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    n_uniq = F.size(F.array_distinct(w))
    n_stop = F.regexp_count(F.col("text"), F.lit(STOPWORD_PATTERN))
    n_sym = F.regexp_count(F.col("text"), F.lit(SYMBOL_PATTERN))
    keep = (
        (n_words >= 30)
        & (n_words <= 1000)
        & (3 * n_words <= sum_wl)
        & (sum_wl <= 10 * n_words)
        & (n_stop >= 2)
        & (20 * n_sym <= F.length("text"))
        & (2 * n_uniq >= n_words)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        sum_wl.cast("bigint").alias("sum_word_len"),
        n_uniq.alias("n_uniq_words"),
        n_stop.alias("n_stop"),
        n_sym.alias("n_sym"),
        keep.alias("keep"),
    )


def contamination_hits(docs: DataFrame, n: int = 3, bench_mod: int = 53) -> DataFrame:
    """Benchmark-contamination check: count each document's distinct word
    n-grams that also appear in any *other* document of the benchmark set
    (here: doc_id % bench_mod == 0 — a deterministic stand-in for an
    eval-suite shingle list). Returns only contaminated docs
    (doc_id, n_hits).

    Real pipelines use 13-grams against a fixed benchmark shingle table; the
    synthetic corpus's tiny vocabulary needs n=3 for a non-degenerate hit
    set — n is the knob, the plan shape is identical.

    At scale: the benchmark shingle set is bounded (eval suites are small),
    so the join is broadcast — each doc's grams are checked map-side with no
    shuffle of the corpus; the only shuffle is the per-doc count aggregation.
    """
    # n-grams via zipped shifted slices (the shingles() formulation — the
    # transform(sequence, slice) form re-evaluated the token split per
    # element in the interpreted lambda, measured ~18x slower)
    toks = F.col("_w")
    cnt = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, 1 + j, cnt) for j in range(n)])
    doc_grams = (
        docs.withColumn("_w", tokens_col(F.col("text")))
        .filter(F.size(toks) >= n)
        .select("doc_id", F.explode(zipped).alias("_z"))
        .select(
            "doc_id",
            F.concat_ws(" ", *[F.col("_z").getField(str(j)) for j in range(n)]).alias("g"),
        )
        .distinct()
    )
    # Per-GRAM bench rollup instead of a row-multiplying join: a doc-gram
    # hits iff some OTHER benchmark doc contains the gram, i.e. the gram's
    # bench membership count is >= 2 or its single member is another doc.
    # doc_grams is already distinct, so the per-doc rollup is a plain
    # count(*) — no join fan-out, no two-shuffle countDistinct.
    bench = (
        doc_grams.filter(F.col("doc_id") % bench_mod == 0)
        .groupBy(F.col("g").alias("bg"))
        .agg(F.count("*").alias("_nb"), F.min("doc_id").alias("_only_bid"))
    )
    return (
        doc_grams.join(F.broadcast(bench), F.col("g") == F.col("bg"))
        .filter((F.col("_nb") >= 2) | (F.col("_only_bid") != F.col("doc_id")))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def bpe_token_hist(docs: DataFrame) -> DataFrame:
    """BPE-ish regex tokenization histogram: word / number / punctuation
    token counts per language (class-based pattern, Java+RE2 dialect-safe)."""
    def n_tok(pat: str):
        return F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0))).cast("bigint")

    return docs.groupBy("lang").agg(
        n_tok("[a-z]+").alias("n_word"),
        n_tok("[0-9]+").alias("n_num"),
        n_tok(r"[^a-z0-9\s]").alias("n_punct"),
        F.count("*").alias("n_docs"),
    )


def lm_train_counts(docs: DataFrame) -> DataFrame:
    """Distributed LM training: the hashed trigram + bigram-context count
    tables core/lm.py's PerplexityModel scores with, built from a (lang,
    text) corpus as ONE aggregation — the engine trains its own quality
    models instead of importing frozen artifacts.

    Shape at 10^12 docs: the Arrow-batched map emits PER-BATCH PARTIAL
    counts (one bincount per (lang, kind) inside the batch), so shuffle
    volume is bounded by langs x 2 x 65,536 rows per batch regardless of
    corpus size — a Python-side map combine ahead of the single (lang,
    kind, bucket) hash shuffle. Counts are integers, so the distributed
    sum is bit-identical to a single-process pass (no float reduction
    order to pin), and a PerplexityModel assembled from the result scores
    bit-identically to one counted serially (tests/test_text_models.py).

    Skip rule mirrors PerplexityModel.ppl_one: null/whitespace-only text
    and null lang contribute nothing.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..core.lm import N_BUCKETS, _tri_bi_hashes

    sel = docs.select("lang", "text")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            per_lang: dict[str, list] = {}
            for lang, text in zip(pdf["lang"], pdf["text"]):
                if not text or not text.strip() or lang is None or pd.isna(lang):
                    continue
                h3, h2 = _tri_bi_hashes(text.lower())
                per_lang.setdefault(lang, ([], []))
                per_lang[lang][0].append(h3)
                per_lang[lang][1].append(h2)
            out_lang: list[str] = []
            out_kind: list[str] = []
            out_bucket: list[np.ndarray] = []
            out_n: list[np.ndarray] = []
            for lang, (tris, bis) in per_lang.items():
                for kind, parts in (("tri", tris), ("bi", bis)):
                    cnt = np.bincount(np.concatenate(parts), minlength=N_BUCKETS)
                    nz = np.flatnonzero(cnt)
                    out_lang.extend([lang] * nz.size)
                    out_kind.extend([kind] * nz.size)
                    out_bucket.append(nz)
                    out_n.append(cnt[nz])
            yield pd.DataFrame(
                {
                    "lang": out_lang,
                    "kind": out_kind,
                    "bucket": pd.array(
                        np.concatenate(out_bucket) if out_bucket else [], dtype="int64"
                    ),
                    "n": pd.array(np.concatenate(out_n) if out_n else [], dtype="int64"),
                }
            )

    partial = sel.mapInPandas(_run, schema="lang string, kind string, bucket long, n long")
    return partial.groupBy("lang", "kind", "bucket").agg(F.sum("n").alias("n"))


def lm_model_from_counts(rows) -> "object":
    """Assemble a core/lm.PerplexityModel from collected lm_train_counts
    rows (lang, kind, bucket, n) — the driver-side hand-off from the
    distributed count job to the scoring stage. Bands are not derived here
    (they come from held-out calibration); callers pass their own."""
    import numpy as np

    from ..core.lm import N_BUCKETS, PerplexityModel
    from ..core.text import LANGS

    li = {lang: i for i, lang in enumerate(LANGS)}
    tri = np.zeros((len(LANGS), N_BUCKETS), dtype=np.float64)
    bi = np.zeros((len(LANGS), N_BUCKETS), dtype=np.float64)
    for r in rows:
        if r["lang"] not in li:
            continue
        (tri if r["kind"] == "tri" else bi)[li[r["lang"]], r["bucket"]] += r["n"]
    return PerplexityModel(tri, bi, bands={})


def langid_train_counts(docs: DataFrame) -> DataFrame:
    """Distributed langid training: the hashed 1/2/3-gram count table
    core/langid.LangIdModel scores with, from a (lang, text) corpus — the
    companion of lm_train_counts (together they train BOTH frozen quality
    models the curation pipeline applies, so the full model lifecycle runs
    on the engine).

    Same scale shape as lm_train_counts: per-batch partial bincounts bound
    the shuffle at langs x 65,536 rows per batch, one hash aggregation,
    integer counts -> bit-identical to a serial pass.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..core.langid import N_BUCKETS, ngram_hashes

    sel = docs.select("lang", "text")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            per_lang: dict[str, list] = {}
            for lang, text in zip(pdf["lang"], pdf["text"]):
                if not text or not text.strip() or lang is None or pd.isna(lang):
                    continue
                per_lang.setdefault(lang, []).append(ngram_hashes(text))
            out_lang: list[str] = []
            out_bucket: list[np.ndarray] = []
            out_n: list[np.ndarray] = []
            for lang, parts in per_lang.items():
                cnt = np.bincount(np.concatenate(parts), minlength=N_BUCKETS)
                nz = np.flatnonzero(cnt)
                out_lang.extend([lang] * nz.size)
                out_bucket.append(nz)
                out_n.append(cnt[nz])
            yield pd.DataFrame(
                {
                    "lang": out_lang,
                    "bucket": pd.array(
                        np.concatenate(out_bucket) if out_bucket else [], dtype="int64"
                    ),
                    "n": pd.array(np.concatenate(out_n) if out_n else [], dtype="int64"),
                }
            )

    partial = sel.mapInPandas(_run, schema="lang string, bucket long, n long")
    return partial.groupBy("lang", "bucket").agg(F.sum("n").alias("n"))


def langid_model_from_counts(rows, smooth: float = 1.0) -> "object":
    """Assemble a core/langid.LangIdModel from collected langid_train_counts
    rows (lang, bucket, n): counts + add-one smoothing -> per-language
    log-probabilities — the driver-side hand-off from the distributed count
    job to the scorer."""
    import numpy as np

    from ..core.langid import N_BUCKETS, LangIdModel
    from ..core.text import LANGS

    li = {lang: i for i, lang in enumerate(LANGS)}
    counts = np.full((len(LANGS), N_BUCKETS), smooth, dtype=np.float64)
    for r in rows:
        if r["lang"] in li:
            counts[li[r["lang"]], r["bucket"]] += r["n"]
    logprob = np.log(counts / counts.sum(axis=1, keepdims=True))
    return LangIdModel(logprob, tuple(LANGS))


def pmi_collocations(
    docs: DataFrame, min_count: int = 5, k: int = 50
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information —
    PMI(w1,w2) = log( N * c(w1,w2) / (c(w1) * c(w2)) ) over lowercase
    alphabetic word bigrams [Church & Hanks 1990].

    The log is monotone, so the RANKING uses the exact rational
    N*c12/(c1*c2): three BIGINT counts, two BIGINT products, ONE double
    division — correctly rounded IEEE, bit-identical in any engine, so
    the q97 oracle compares the score itself, no epsilon. (At 10^12
    tokens the products near int64 range; shift to double products
    there — ordering error is then 1-ulp class, irrelevant for top-k.)

    Shape: tokenize + self-zip (slice/arrays_zip, JVM codegen), ONE
    explode, then three count aggregates; unigram counts join back onto
    the bigram table via two broadcast-able joins when the vocabulary is
    bounded — here plain equi-joins keyed on a word, the classic
    word-count skew profile ("the") which the min_count prefilter does
    NOT cap, so at web scale run the c1/c2 attach AFTER the min_count
    filter (done below: only surviving bigrams join) and let AQE handle
    the residual head."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
    )
    t = docs.select(toks.alias("_t"))
    uni = (
        t.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.size("_t") - 1
    big = (
        t.select(
            F.explode(
                F.arrays_zip(
                    F.slice("_t", 1, F.greatest(n, F.lit(0))).alias("w1"),
                    F.slice("_t", 2, F.greatest(n, F.lit(0))).alias("w2"),
                )
            ).alias("b")
        )
        .select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= min_count)
    )
    n_total = (
        t.select(F.greatest(n, F.lit(0)).alias("_n"))
        .agg(F.sum("_n").alias("n_total"))
    )
    scored = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_total))
        .select(
            "w1", "w2", "c12", "c1", "c2",
            ((F.col("n_total") * F.col("c12")).cast("double")
             / (F.col("c1") * F.col("c2")).cast("double")).alias("lift"),
        )
    )
    # total order (lift, w1, w2) -> deterministic cutoff; orderBy+limit
    # plans TakeOrderedAndProject (per-partition heaps, no global sort)
    return scored.orderBy(
        F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)


def inverted_index(
    docs: DataFrame, shard_log2: int = 0, max_df: int | None = None
) -> DataFrame:
    """Posting-list construction — the retrieval-index build step: one
    row per term (per posting shard) with document frequency, total term
    frequency and the doc_id-sorted posting list as 'doc_id:tf' strings.

    shard_log2 is the hot-term defense: a web-scale stopword's posting
    list is df-sized and would concentrate in ONE reducer row; with
    shard_log2 = s each term's postings split across 2^s deterministic
    shards keyed by crc32(doc_id), so per-row (and per-reducer-group)
    width drops 2^s-fold and the consumer merges shards (their union is
    exactly the unsharded list — pinned in pytest). max_df drops
    stopword-class terms outright (standard IR practice).

    Two shuffles: (term, doc) tf counts, then (term, shard) list agg;
    sort_array on the collected structs keeps ordering engine-side."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
    )
    tf = (
        docs.select(F.col("doc_id"), F.explode(toks).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    shard = (
        (F.crc32(F.col("doc_id").cast("string")) % (2 ** shard_log2)).cast("int")
        if shard_log2 > 0
        else F.lit(0).cast("int")
    )
    idx = (
        tf.withColumn("shard", shard)
        .groupBy("term", "shard")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("tf_total"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("doc_id", "tf"))),
                lambda s: F.concat_ws(":", s.doc_id, s.tf),
            ).alias("postings"),
        )
    )
    if max_df is not None:
        # per-TERM df (sum over shards) via a second tiny agg + join
        termdf = idx.groupBy("term").agg(F.sum("df").alias("_tdf"))
        idx = idx.join(
            F.broadcast(termdf.filter(F.col("_tdf") <= max_df)), "term"
        ).drop("_tdf")
    return idx


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-k terms by tf-idf — the keyword-extraction pass.
    Same log-free trick as pmi_collocations: idf = log(N/df) is monotone
    in the rational N/df, so rank by score = tf * N / df (two BIGINTs,
    one IEEE division — bit-identical across engines); ties break by
    term asc, making the per-doc cutoff total-ordered and oracle-exact.

    Shape: (term, doc) tf counts, per-term df agg, df attach back on the
    tf table (term-keyed equi-join; AQE handles the stopword head), N by
    broadcast, then a row_number window inside each doc partition —
    bounded by per-doc vocabulary, no global sort."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
    )
    tf = (
        docs.select(F.col("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        # tf feeds the df rollup AND the score join; materialize the
        # (vocab x docs)-bounded table once instead of re-running the
        # regex explode per consumer. Partitioned by doc_id so the top-k
        # window below reuses the layout (and AQE cannot coalesce the
        # checkpoint to one pinned partition).
        .repartition(
            min(docs.sparkSession.sparkContext.defaultParallelism, 64), "doc_id"
        )
        .localCheckpoint(eager=True)
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term", "tf", "df",
            ((F.col("tf") * F.col("n_docs")).cast("double")
             / F.col("df").cast("double")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
    )


CR_DDL = (
    "clip_id string, raw_len int, comp_len int, "
    "too_repetitive boolean, too_random boolean, keep boolean"
)


def transcript_compressibility(clips: DataFrame) -> DataFrame:
    """Per-transcript zlib compressibility quality signal (q163): the
    classic curation filter the regex rules cannot express — templated /
    repetitive boilerplate compresses far below natural prose while symbol
    noise barely compresses at all. Arrow-batched mapInPandas (zlib is C
    inside the batch loop, nothing per-row at the Spark level); all output
    columns integer/boolean via core/text.compress_keep's cross-multiplied
    band so the committed fixture pins the whole computation. Shuffle-free
    narrow map at any scale."""
    import pandas as pd

    from ..core.text import compress_keep, compress_metrics

    def _run(batches):
        for pdf in batches:
            raws, comps, reps, rnds, keeps = [], [], [], [], []
            for t in pdf["transcript"]:
                raw, comp = compress_metrics(None if pd.isna(t) else str(t))
                rep, rnd, keep = compress_keep(raw, comp)
                raws.append(raw)
                comps.append(comp)
                reps.append(rep)
                rnds.append(rnd)
                keeps.append(keep)
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "raw_len": pd.array(raws, dtype="Int32"),
                    "comp_len": pd.array(comps, dtype="Int32"),
                    "too_repetitive": reps,
                    "too_random": rnds,
                    "keep": keeps,
                }
            )

    return clips.select("clip_id", "transcript").mapInPandas(_run, schema=CR_DDL)


CS_DDL = (
    "clip_id string, n_windows int, lang_primary string, n_primary int, "
    "lang_secondary string, n_secondary int, mixed boolean"
)


def codeswitch_clips(clips: DataFrame, aug_every: int = 0) -> DataFrame:
    """Segment-level language-ID voting over transcripts (q165): slide an
    8-word window (hop 4), classify each with the frozen langid model, and
    report majority/minority languages plus the integer mixed verdict
    (core/langid.codeswitch_stats) — the code-switching signal the
    pipeline's whole-transcript langid stage cannot express; mixed rows
    are route-to-review candidates (wrong-language contamination, spliced
    uploads).

    aug_every > 0 plants a deterministic code-switched mx_ variant for
    every aug_every-th datagen clip (core/langid.mixed_variant — the text
    analogue of the audio planting lanes). The composable default
    (aug_every=0) accepts ARBITRARY clip ids (the q38-family contract).
    Arrow-batched narrow map; the model trains once per worker process
    (the daemon preload covers it), nothing per-row at the Spark level."""
    import pandas as pd

    from ..core.langid import codeswitch_stats, mixed_variant

    def _run(batches):
        from .audio_fp import clip_index

        cols = ("n_windows", "lang_primary", "n_primary", "lang_secondary", "n_secondary", "mixed")
        for pdf in batches:
            out = {c: [] for c in ("clip_id",) + cols}

            def _emit(cid, st):
                out["clip_id"].append(cid)
                for c in cols:
                    out[c].append(st[c])

            for cid, t in zip(pdf["clip_id"], pdf["transcript"]):
                t = None if pd.isna(t) else str(t)
                _emit(cid, codeswitch_stats(t))
                if aug_every and t and t.strip() and clip_index(cid) % aug_every == 0:
                    i = clip_index(cid)
                    _emit(f"mx_{i:012d}", codeswitch_stats(mixed_variant(t, cid)))
            df = pd.DataFrame(out)
            df["n_windows"] = df["n_windows"].astype("int32")
            df["n_primary"] = df["n_primary"].astype("int32")
            df["n_secondary"] = df["n_secondary"].astype("int32")
            yield df

    return clips.select("clip_id", "transcript").mapInPandas(_run, schema=CS_DDL)


# Latin -> Cyrillic confusable pairs (Unicode UTS#39 confusables: the six
# letter shapes shared glyph-for-glyph across the two scripts, both cases)
HOMOGLYPH_LATIN = "aeopcxAEOPCX"
HOMOGLYPH_CYRILLIC = "аеорсхАЕОРСХ"
_CYR_CLASS = "[Ѐ-ӿ]"
_LAT_CLASS = "[A-Za-z]"


def homoglyph_audit(docs: DataFrame, plant_every: int = 0) -> DataFrame:
    """Per-document MIXED-SCRIPT / homoglyph audit: count words that mix
    Latin and Cyrillic letters inside one token — the classic spam /
    SEO-cloaking / filter-evasion signal (UTS#39 confusables: "pаypаl"
    with Cyrillic а's passes a naive blocklist but no human keyboard
    produces it). A word with BOTH scripts is deliberate obfuscation with
    near-certainty; whole-word script switching (real multilingual text)
    is NOT flagged — that is q165's code-switching lane.

    Entirely JVM-native Column algebra (split + higher-order filter +
    rlike; regexes are Java/RE2-identical), so the DuckDB oracle re-derives
    the WHOLE computation — plants included — in pure SQL over the shared
    `documents` view: no fixture, value-checked end to end.

    plant_every > 0 adds a deterministic ho_ ground-truth variant of every
    plant_every-th non-empty doc: translate() over the 6 confusable pairs
    (both cases) — the full-substitution attack. Plants with NO flaggable
    word exist in principle (a text whose every word maps entirely into
    Cyrillic) but do not occur in the corpus; the registered query reports
    the measured recall in its docstring.

    Output (doc_key, n_words, n_mixed, n_cyr, suspect) — all longs /
    boolean. At 10^12 docs: narrow map, no shuffle, no UDF.
    """
    def _audit(df: DataFrame, key: Column) -> DataFrame:
        words = F.filter(
            F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"),
            lambda w: w != F.lit(""),
        )
        mixed = F.filter(
            words, lambda w: w.rlike(_LAT_CLASS) & w.rlike(_CYR_CLASS)
        )
        cyr = F.filter(words, lambda w: w.rlike(_CYR_CLASS))
        return df.select(
            key.alias("doc_key"),
            F.size(words).cast("long").alias("n_words"),
            F.size(mixed).cast("long").alias("n_mixed"),
            F.size(cyr).cast("long").alias("n_cyr"),
            (F.size(mixed) >= 1).alias("suspect"),
        )

    base = _audit(docs, F.concat(F.lit("doc_"), F.col("doc_id").cast("string")))
    if not plant_every:
        return base
    plants = _audit(
        docs.filter(
            (F.col("doc_id") % plant_every == 0)
            & F.col("text").isNotNull()
            & (F.col("text") != "")
        ).withColumn(
            "text", F.translate(F.col("text"), HOMOGLYPH_LATIN, HOMOGLYPH_CYRILLIC)
        ),
        F.concat(F.lit("ho_"), F.col("doc_id").cast("string")),
    )
    return base.unionAll(plants)


BOILER_SENTENCE = "Subscribe to our newsletter today"


def boilerplate_audit(docs: DataFrame, plant_every: int = 0, min_docs: int = 3) -> DataFrame:
    """Per-document BOILERPLATE audit: sentences shared verbatim by >=
    min_docs distinct documents are template chrome (footers, cookie
    banners, "all rights reserved"), not content — the classic curation
    signal that per-doc quality scores (q42) and cross-doc near-dup pairs
    (q21/q22) both miss: boilerplate contaminates MOST docs a little
    rather than making any pair near-identical.

    Shape at 10^12 docs: explode to (doc, sentence), ONE count-distinct
    aggregation per sentence (map-side partial dedup absorbs the hot
    boilerplate keys), then the small flagged-sentence set broadcasts back
    over the exploded frame — no second wide shuffle. Entirely JVM-native
    (split + transform + filter + explode), so the DuckDB oracle re-derives
    the WHOLE computation — plants included — in pure SQL over the shared
    `documents` view: no fixture, value-checked end to end.

    plant_every > 0 adds a deterministic bo_ ground-truth variant of every
    plant_every-th non-empty doc with BOILER_SENTENCE appended — the
    planted template sentence lands in n/plant_every docs (25 at sf0.01)
    while measured natural cross-doc sentence sharing is ZERO, so min_docs
    = 3 separates with nothing in between (a base sentence reaches at most
    2 docs: itself and its own bo_ copy).

    Output (doc_key, n_sentences, n_boiler, suspect) — longs / boolean.
    """
    sent_list = F.filter(
        F.transform(
            F.split(F.coalesce(F.col("text"), F.lit("")), r"\. "),
            lambda s: F.trim(s),
        ),
        lambda s: s != F.lit(""),
    )

    base = docs.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("doc_key"),
        F.col("text"),
    )
    corpus = base
    if plant_every:
        plants = docs.filter(
            (F.col("doc_id") % plant_every == 0)
            & F.col("text").isNotNull()
            & (F.col("text") != "")
        ).select(
            F.concat(F.lit("bo_"), F.col("doc_id").cast("string")).alias("doc_key"),
            F.concat(F.col("text"), F.lit(f". {BOILER_SENTENCE}.")).alias("text"),
        )
        corpus = base.unionAll(plants)

    sents = corpus.select(
        "doc_key", F.explode(sent_list.alias("ss")).alias("sent")
    )
    boiler = (
        sents.groupBy("sent")
        .agg(F.countDistinct("doc_key").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("sent")
    )
    per_doc = (
        sents.join(F.broadcast(boiler), "sent")
        .groupBy("doc_key")
        .agg(F.count("*").alias("n_boiler"))
    )
    return (
        corpus.select("doc_key", F.size(sent_list).cast("long").alias("n_sentences"))
        .join(per_doc, "doc_key", "left")
        .select(
            "doc_key",
            "n_sentences",
            F.coalesce(F.col("n_boiler"), F.lit(0)).cast("long").alias("n_boiler"),
            (F.coalesce(F.col("n_boiler"), F.lit(0)) >= 1).alias("suspect"),
        )
    )
