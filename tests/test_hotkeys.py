"""Hot-key defense in pair-generating joins (operators/pairs.py).

Plants a corpus with ~500 identical documents (one boilerplate cluster —
the 100 TB hazard: a single shared band/fingerprint key would emit ~125k
candidate pairs per band without the cap) and asserts:
  * candidate-pair count stays O(m * cap), not O(m^2);
  * every cluster member is still connected to the cluster representative
    (star pairs), so dedup semantics survive the cap;
  * with cap >= m the output equals the uncapped all-pairs join exactly
    (the testdata regime, where oracle parity holds).
"""

import pytest
from pyspark.sql import functions as F

M = 500  # identical docs planted on one key


@pytest.fixture(scope="module")
def boiler_docs(spark):
    rows = [(i, "the exact same boilerplate sentence repeated verbatim here") for i in range(M)]
    # fully-disjoint token streams: no legitimate near-dup pairs among these
    rows += [
        (M + i, " ".join(f"w{i}x{j}q{(i * 31 + j * 7) % 97}" for j in range(12)))
        for i in range(50)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_capped_key_pairs_star_not_quadratic(spark):
    from datasmith_spark.operators.pairs import capped_key_pairs

    keyed = spark.createDataFrame(
        [(i, "hot") for i in range(M)] + [(1000 + i, f"cold{i % 10}") for i in range(30)],
        "id bigint, k string",
    )
    out = capped_key_pairs(keyed, "k", "id", cap=64).collect()
    # hot key: M-1 star pairs; cold keys: 10 groups of 3 -> 3 pairs each
    assert len(out) == (M - 1) + 10 * 3
    stars = [(r.a, r.b) for r in out if r.b < 1000]
    assert all(a == 0 for a, _ in stars)  # representative = min id
    assert {b for _, b in stars} == set(range(1, M))


def test_capped_equals_uncapped_when_under_cap(spark):
    from datasmith_spark.operators.pairs import capped_key_pairs

    keyed = spark.createDataFrame(
        [(i, f"k{i % 7}") for i in range(60)], "id bigint, k string"
    )
    capped = {(r.a, r.b) for r in capped_key_pairs(keyed, "k", "id", cap=1024).collect()}
    a = keyed.select(F.col("id").alias("a"), "k")
    b = keyed.select(F.col("id").alias("b"), "k")
    plain = {
        (r.a, r.b)
        for r in a.join(b, "k").filter(F.col("a") < F.col("b")).select("a", "b").collect()
    }
    assert capped == plain


def test_minhash_pairs_capped_on_boilerplate(spark, boiler_docs):
    from datasmith_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    sh = shingles(boiler_docs)
    pairs = lsh_candidate_pairs(minhash_signatures(sh), cap=64).collect()
    # identical docs share every band -> without the cap this would be
    # m(m-1)/2 = 124,750 pairs; star mode emits exactly m-1
    assert len(pairs) == M - 1
    assert all(r.doc_a == 0 and 1 <= r.doc_b < M for r in pairs)


def test_simhash_pairs_capped_on_boilerplate(spark, boiler_docs):
    from datasmith_spark.operators.dedup import simhash_candidate_pairs

    pairs = simhash_candidate_pairs(boiler_docs, cap=64).collect()
    cluster = [(r.doc_a, r.doc_b) for r in pairs if r.doc_b < M]
    assert len(cluster) == M - 1
    assert all(a == 0 for a, _ in cluster)
    # candidate total stays linear-ish, nowhere near m^2/2
    assert len(pairs) < 4 * (M + 50)


def test_winnow_pairs_capped_on_boilerplate(spark, boiler_docs):
    from datasmith_spark.operators.text_analysis import fingerprint_pairs

    out = fingerprint_pairs(boiler_docs, min_shared=1, cap=64).collect()
    cluster = [(r.doc_a, r.doc_b) for r in out if r.doc_b < M]
    assert len(cluster) == M - 1
    assert all(a == 0 for a, _ in cluster)


def test_simhash_skips_tokenless_docs(spark):
    """Null/empty/whitespace docs must emit no SimHash row (fingerprint 0
    would collide them all on every band; the SQL oracle omits them too)."""
    from datasmith_spark.operators.dedup import simhash_bands, simhash_candidate_pairs

    rows = [(1, "real words here"), (2, None), (3, ""), (4, "   "), (5, "real words here")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    assert {r.id for r in simhash_bands(docs).collect()} == {1, 5}
    pairs = {(r.doc_a, r.doc_b) for r in simhash_candidate_pairs(docs).collect()}
    assert pairs == {(1, 5)}


def test_capped_sql_mirror_matches_spark(spark):
    """The DuckDB CTE body embedded in the q21/q22/q26/q31/q34 oracles must
    reproduce capped_key_pairs exactly in BOTH consumption modes (distinct
    pair set, and per-shared-key multiplicity) on a corpus that actually
    trips the cap — so oracle parity is guaranteed beyond the testdata
    regime, not just while every key stays under the default cap."""
    import duckdb
    import pandas as pd

    from datasmith_spark.operators.pairs import capped_key_pairs
    from datasmith_spark.queries import _capped_pairs_sql_cte

    rows = (
        [(i, "hot") for i in range(40)]
        + [(i, f"warm{i % 3}") for i in range(12)]
        + [(1000 + i, f"cold{i % 5}") for i in range(20)]
    )
    cap = 8
    keyed = spark.createDataFrame(rows, "id bigint, k string")
    spark_mult = sorted((r.a, r.b) for r in capped_key_pairs(keyed, "k", "id", cap=cap).collect())
    spark_dist = sorted(set(spark_mult))

    con = duckdb.connect()
    con.register("melt_src", pd.DataFrame(rows, columns=["id", "k"]))
    q = f"WITH melt AS (SELECT id, k FROM melt_src), {_capped_pairs_sql_cte(cap)} "
    sql_mult = sorted(map(tuple, con.sql(q + "SELECT a, b FROM allp").fetchall()))
    sql_dist = sorted(map(tuple, con.sql(q + "SELECT a, b FROM cand").fetchall()))
    assert spark_mult == sql_mult
    assert spark_dist == sql_dist
