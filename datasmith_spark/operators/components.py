"""Connected components over duplicate-pair edges -> canonical keep-set.

Every near-dup lane in this engine (q21/q22 MinHash, q25 embeddings, q26
SimHash, q31 winnowing, q38/q40 audio fingerprints) emits PAIRS; a curation
pipeline ends with a decision: group the pairs into duplicate clusters and
keep ONE canonical document per cluster. This module closes that loop as an
iterative DataFrame algorithm — no driver-side graph, no .collect().

Algorithm: Hash-Min label propagation (Rastogi et al., "Finding Connected
Components in Map-Reduce in Logarithmic Rounds", ICDE 2013 — the Hash-Min
variant). Every node starts labeled with itself; each round every node
takes the min of its own label and its neighbors' labels. The component's
global min-id spreads one hop per round, so the algorithm converges in
eccentricity(min-node) <= diameter rounds. For near-duplicate graphs this
is the right trade: dup clusters are shallow (a source doc and its
re-encodes/mutations all pairwise-linked, diameter 1-3), so Hash-Min does
2-4 rounds of {join + min-aggregate}, each a plain hash shuffle on the node
id — cheaper per round and simpler than the O(log^2 n) large-star/small-star
alternation, which only wins on deep path-shaped graphs that dup detection
never produces (a chain of near-dups A~B~C~... with A !~ C is length-bounded
by the Jaccard threshold).

Scale notes (10^12 docs):
  * State per round is one (id, lbl) row per node **touched by an edge** —
    docs with no dup pair never enter the computation (they are implicitly
    their own cluster), so the working set is O(dup pairs), typically a few
    percent of the corpus.
  * Labels only ever decrease, so each round's output is localCheckpoint-ed
    (eager) to truncate lineage — iteration i's plan does not replay
    iterations 0..i-1 (the classic iterative-algorithm lineage blowup).
  * The symmetrized edge list is persisted once and reused every round;
    both per-round shuffles hash-partition on the same node-id key.
  * Convergence is detected with a count of changed labels (join on id);
    labels are monotone non-increasing, so a round with zero changes is a
    global fixpoint.

Reference ancestry: the reference dedups by exact cache-key equality only
(/root/reference/src/datasmith/utils.py:85-119); clustering fuzzy-match
pairs into a keep-set is the standard web-scale extension of that
semantics.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every node that appears in `edges`, where
    `component` is the minimum node id in the node's connected component.
    Ids may be any orderable type (numeric or string). Raises RuntimeError
    if max_iter rounds do not reach the fixpoint (never happens for graphs
    whose diameter < max_iter)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iter):
            # neighbor labels flow along edges; min with own label
            msgs = sym.join(labels.withColumnRenamed("id", "v"), "v").select(
                F.col("u").alias("id"), "lbl"
            )
            new = (
                labels.union(msgs)
                .groupBy("id")
                .agg(F.min("lbl").alias("lbl"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new.join(labels.withColumnRenamed("lbl", "old"), "id")
                .filter(F.col("lbl") != F.col("old"))
                .count()
            )
            labels = new
            if changed == 0:
                return labels.select("id", F.col("lbl").alias("component"))
    finally:
        sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def dedup_keep_set(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Cluster duplicate pairs and pick the canonical survivor per cluster.

    Returns one row per CLUSTERED doc: (doc_id, cluster_id, n_members,
    keep) where cluster_id is the min doc id in the cluster and keep marks
    the canonical representative (doc_id == cluster_id — deterministic,
    engine-portable, and stable under re-runs). Docs that never appear in a
    pair are absent: they are trivially their own cluster and a caller
    drops dup rows with a left-anti join against `filter(~keep)`."""
    cc = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    # NOT broadcast: at scale there is one row per cluster (could be 1e10+);
    # the agg output is already hash-partitioned on component, so this join
    # re-uses that partitioning and only the cc side exchanges.
    sizes = cc.groupBy("component").agg(F.count("*").cast("int").alias("n_members"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "n_members",
            (F.col("id") == F.col("component")).alias("keep"),
        )
    )
