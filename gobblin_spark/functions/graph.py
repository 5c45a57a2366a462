"""Connected components over a pair list — the step that turns
near-duplicate PAIRS (MinHash/SimHash/embedding output) into dedup
GROUPS so "keep one per cluster" is transitive: if A~B and B~C, all
three land in one component even though (A, C) never surfaced as a
pair.

No reference analog (Gobblin stops at ingestion); the algorithm is
min-label propagation, the DataFrame-native core of the map-reduce CC
family (Kiveris et al. 2014, "Connected Components in MapReduce and
Beyond" — the large-star/small-star optimizations apply at extreme
skew; plain propagation is the right default).

100 TB design: each iteration is ONE join (labels onto the bidirected
edge list) + ONE min-groupBy — both hash-partitioned on the node id,
so successive iterations reuse the same partitioning. Iterations
needed = graph diameter; near-dup graphs are piles of small cliques
(diameter ≤ 3-4 in practice), so the loop converges in a handful of
rounds. Labels are ``localCheckpoint``-ed each round — iterative self-joins
otherwise DOUBLE the logical plan every iteration and the driver dies
planning, not computing (on a cluster prefer reliable
``checkpoint()`` to survive executor loss). The loop breaks on a zero
changed-count; ``max_iter`` bounds adversarial chains. Convergence is
checked with a 1-row count, not a collect of labels."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in *edges*; component = the
    smallest node id reachable through any chain of pairs. Undirected:
    each edge propagates labels both ways."""
    # one scan of the (possibly expensive) edge plan: exploding both
    # directions from the same row halves the upstream work vs a
    # union of two selects, which would execute the edge pipeline
    # twice before the checkpoint
    bi = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("_e")
        )
        .select(F.col("_e.u").alias("u"), F.col("_e.v").alias("v"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        bi.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # neighbor's current label, folded with my own, min per node
        nbr = (
            bi.join(labels.withColumnRenamed("id", "v"), "v")
            .select(F.col("u").alias("id"), "component")
        )
        # localCheckpoint cuts the lineage BEFORE the changed-count so
        # each round plans against a materialized table, not the whole
        # iteration history
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "_old"), "id")
            .filter(F.col("component") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no convergence in {max_iter} "
        "iterations (graph diameter too large — raise max_iter)")


def keep_one_per_component(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Transitive near-dup removal: survivors = rows that are either
    outside the pair graph entirely, or the MINIMUM id of their
    component (the canonical representative). A broadcast-or-shuffle
    anti-join on ids only — document bodies never move."""
    cc = connected_components(pairs, src, dst)
    losers = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col))
    return df.join(losers, id_col, "left_anti")
