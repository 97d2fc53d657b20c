"""Hot-key-safe candidate-pair generation for banded/bucketed dedup joins.

Every near-dup operator here generates candidates by self-joining ids on a
short key (MinHash band digest, SimHash band, winnowing fingerprint, LSH
band). A key shared by m ids yields m^2/2 pairs — at testdata scale m is
tiny, but at 10^12 docs a boilerplate-heavy corpus can put thousands of
identical documents on one key, turning one reducer into an O(m^2) bomb
that AQE skew-splitting cannot fix (it splits the shuffle, not the row
count).

Defense: per-key frequency cap. Keys held by <= cap ids produce ALL pairs
(exact, unchanged semantics); hotter keys emit STAR pairs (min-id
representative, member) — O(m) rows that still connect every member of the
key's duplicate cluster to one representative, which is exactly what a
dedup consumer needs (transitive closure via the representative). The cap
defaults above every key frequency in the test corpora, so oracle results
are unchanged there; tests/test_hotkeys.py plants ~500 identical docs and
asserts the candidate count stays O(m * cap), not O(m^2).

Ancestry: the reference dedups via an exact seen-set
(/root/reference/src/datasmith/scrape/code_coverage.py:83-88); the cap is
the extra guard its exact-key scheme never needed but banded LSH does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_key_cap(cap: int | None = None) -> int:
    """Default hot-key cap (env-overridable); > every testdata key freq."""
    return cap if cap is not None else int(os.environ.get("SPARK_GRAFT_PAIR_KEY_CAP", "1024"))


def capped_key_pairs(
    keyed: DataFrame,
    key: str,
    id_col: str,
    cap: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Same-key id pairs (a < b) with the hot-key defense described above.

    keyed: (id_col, key) rows, one per id-key membership. Output may contain
    one row per shared key (callers .distinct() or count multiplicities).
    The key-frequency side table is one extra groupBy on the same join key —
    map-side combinable, uniform, and tiny next to the pair join it guards.
    """
    cap = pair_key_cap(cap)
    # Materialize the (id, key) relation once, hash-partitioned by the join
    # key: it feeds BOTH the stats groupBy and the pair self-join, and
    # without a checkpoint Spark re-executes the entire upstream (shingle
    # explode + signature aggregation for the LSH callers — the expensive
    # half of every near-dup query) once per consumer. The explicit
    # partition count also stops AQE from coalescing the small relation to
    # one partition, which a checkpoint would otherwise pin for every
    # downstream stage. Partitioning by `key` lets the groupBy and the
    # self-join below reuse the exchange outright. Callers whose keyed
    # relation is already materialized (session-cached fingerprint key
    # tables) pass materialize=False — for them the checkpoint would only
    # duplicate cheap cached reads into an extra write pass.
    if materialize:
        spark = keyed.sparkSession
        n_par = min(spark.sparkContext.defaultParallelism, 64)
        keyed = keyed.repartition(n_par, key).localCheckpoint(eager=True)
    stats = keyed.groupBy(key).agg(F.count("*").alias("_kc"), F.min(id_col).alias("_rep"))
    ks = keyed.join(stats, key)
    cold = ks.filter(F.col("_kc") <= cap)
    x = cold.select(F.col(id_col).alias("a"), key)
    y = cold.select(F.col(id_col).alias("b"), key)
    pairs = x.join(y, key).filter(F.col("a") < F.col("b")).select("a", "b")
    # star fallback: representative = min id per key, so a < b by construction
    hot = ks.filter((F.col("_kc") > cap) & (F.col(id_col) != F.col("_rep"))).select(
        F.col("_rep").alias("a"), F.col(id_col).alias("b")
    )
    return pairs.unionByName(hot)


def capped_band_pairs(
    bands: DataFrame,
    band_cols: list[str],
    id_col: str,
    cap: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Distinct (a, b) pairs of ids agreeing on ANY of the band columns,
    protected by the hot-key cap.

    Bands are MELTED into (id, "band#key") rows first (one narrow explode),
    so candidate generation is ONE stats groupBy + ONE self-join on the
    composite key instead of one join per band — b× fewer shuffles for
    b bands, identical output (the band index inside the key keeps bands
    from colliding with each other)."""
    # F.concat (not concat_ws) so a NULL band value yields a NULL key,
    # filtered out below — matching equi-join semantics (null joins nothing)
    melted = bands.select(
        id_col,
        F.explode(
            F.array(*[F.concat(F.lit(f"{i}#"), F.col(c)) for i, c in enumerate(band_cols)])
        ).alias("_bk"),
    ).filter(F.col("_bk").isNotNull())
    return capped_key_pairs(melted, "_bk", id_col, cap, materialize=materialize).distinct()
