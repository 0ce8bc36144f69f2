"""Connected components over a pair graph — dedup CLUSTER RESOLUTION.

Near-duplicate detection emits pairs; a training-data pipeline needs
clusters ("keep one doc per duplicate group"), and pairs compose
transitively: (a,b) and (b,c) mean {a,b,c} are one group. This operator
assigns every node the MINIMUM reachable node id as its component label —
deterministic, order-independent, and exactly what a keep-smallest-id
dedup policy needs.

Physical strategy: iterative min-label propagation. Each round every node
takes the min of its own label and its neighbors' labels (one join + one
aggregation = two shuffles per round); convergence in O(graph diameter)
rounds. Near-dup graphs are unions of small dense clusters — diameter is
tiny (2-4), so this beats the O(log n)-round large-star/small-star scheme
on constants while staying linear in edges per round. Lineage is cut with
``localCheckpoint`` each round so the plan doesn't grow with iterations
(the classic iterative-DataFrame trap).

Reference analog: none (the reference has no graph ops) — this is part of
the beyond-reference training-data surface, SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable. Raises if not converged in ``max_iter`` rounds
    (diameter bound exceeded — raise the limit for pathological chains).
    """
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        bidir.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            bidir.join(labels, bidir["v"] == labels["node"])
            .select(F.col("u").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_min)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    src: str = "doc_id_a",
    dst: str = "doc_id_b",
) -> DataFrame:
    """(doc_id, cluster) dedup assignment from a near-dup pair list:
    cluster = smallest doc id in the connected group. With ``all_ids``
    given (the full corpus), singleton docs appear as their own cluster —
    the frame to anti-join for "keep one representative per group"."""
    comp = connected_components(pairs, src, dst).select(
        F.col("node").alias(id_col), F.col("component").alias("cluster")
    )
    if all_ids is not None:
        singles = all_ids.select(id_col).join(
            comp.select(id_col), id_col, "left_anti"
        ).withColumn("cluster", F.col(id_col))
        comp = comp.unionByName(singles)
    return comp


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count over an undirected simple graph — the
    density/clustering diagnostic for near-duplicate pair graphs (a
    dedup candidate set whose triangle density explodes is boilerplate,
    not chance collision).

    Scale shape: degree-ordered orientation (each edge points from its
    (degree, id)-smaller endpoint) before the wedge join — the classic
    trick that bounds every vertex's out-degree by O(sqrt(|E|)), so the
    wedge join volume is O(|E|^1.5) worst case instead of sum(deg^2)
    (a star graph's hub would otherwise form the wedge set alone). Two
    hash joins on vertex keys; each triangle is counted exactly once.

    Returns one row: (n_triangles).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .unionAll(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(
                F.struct(F.col("v").alias("a"), F.col("u").alias("b"))
            )
            .alias("e")
        )
        .select("e.a", "e.b")
    )
    w1 = oriented.select(F.col("a"), F.col("b"))
    w2 = oriented.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = w1.join(w2, "b").select("a", "b", "c")
    closing = oriented.select(
        F.col("a").alias("a"), F.col("b").alias("c"), F.lit(1).alias("__hit")
    )
    return (
        wedges.join(closing, ["a", "c"])
        .agg(F.count("*").alias("n_triangles"))
    )
