"""Connected components by iterative min-label propagation.

The transitive-closure step of near-duplicate clustering: given the pair
graph from MinHash/SimHash/Jaccard, assign every document the minimum
doc_id of its component (the canonical representative). The greedy
``drop_near_duplicates`` keeps lowest-id winners; components give the full
cluster structure (needed when clusters must be sampled or merged rather
than just pruned).

Algorithm: label(v) starts as v; each round every vertex takes the min of
its own label and its neighbors' labels; converged when no label changes.
Rounds = graph diameter (near-dup clusters are shallow — typically 2-4
rounds). Each round is one join + one partial-aggregating groupBy, both
shuffling on vertex id; labels are materialized per round via
functions/caching.loop_cache (plan-truncating) so round i's plan does not
nest rounds 0..i-1 (the canonical iterative-Spark pattern — same
reasoning as the IVF Lloyd loop).

The convergence check collects a single count per round — a scalar, not
data — and the loop is bounded by ``max_iter`` as a safety net.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.caching import loop_cache


def connected_components(
    vertices: DataFrame, edges: DataFrame,
    vertex_col: str = "id", src_col: str = "src", dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) with component = min vertex id in the component.

    ``vertices``: one column (``vertex_col``) of all vertex ids (isolated
    vertices become their own singleton component). ``edges``: undirected
    pairs (each provided once; both directions are derived).
    """
    und = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("t")
    ).unionByName(
        edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("t"))
    )
    # the edge list is consumed by EVERY propagation round; un-pinned, its
    # plan (for near-dup clustering: the whole shingle-explode → Jaccard
    # pair pipeline) recomputes per round — measured 31.7 → 20.0 s for d6
    # at the 30× dir (10.5 → 6.8 at 10×), and under a constrained heap the recomputed
    # aggregates were what OOMed (SCALE.md round-4 spill section)
    und = loop_cache(und, eager=True)

    labels = loop_cache(vertices.select(
        F.col(vertex_col).alias("v"), F.col(vertex_col).alias("label")
    ))

    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und["s"] == labels["v"])
            .select(F.col("t").alias("v"), F.col("label"))
            .groupBy("v")
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, "v", "left")
            .select(
                "v",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.col("nmin") < F.col("label")).alias("__changed"),
            )
        )
        updated = loop_cache(updated, eager=True)
        changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break

    return labels.select(
        F.col("v").alias(vertex_col), F.col("label").alias("component")
    )
