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
    method: str = "minlabel",
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable. Raises if not converged in ``max_iter`` rounds
    (diameter bound exceeded — raise the limit for pathological chains).

    ``method`` picks the physical strategy (identical output):

    * ``"minlabel"`` (default): O(diameter) rounds of neighbor-min
      propagation — the right constant-factor trade for near-dup
      clusters, whose diameter is 2-4.
    * ``"star"``: alternating large-star/small-star (Kiveris et al.
      2014, "Connected Components in MapReduce and Beyond") — O(log n)
      rounds on ANY topology, the choice for general graphs with long
      chains (social graphs, link graphs) where diameter ≫ log n.
      tests/test_operators.py pins that a path graph converges in
      strictly fewer rounds than minlabel needs.
    """
    if method == "star":
        return _cc_star(edges, src, dst, max_iter)[0]
    if method != "minlabel":
        raise ValueError(f"unknown method {method!r}")
    return _cc_minlabel(edges, src, dst, max_iter)[0]


def _cc_minlabel(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> tuple[DataFrame, int]:
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
    for rounds in range(1, max_iter + 1):
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
            return labels, rounds
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def _cc_star(
    edges: DataFrame, src: str, dst: str, max_iter: int
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star. Each round: large-star hangs
    every neighbor LARGER than u off the minimum of u's closed
    neighborhood; small-star (on the high→low directed view) re-points
    every smaller neighbor and u itself at that minimum. Both are one
    groupBy + one join (two shuffles); the edge set provably shrinks
    toward stars rooted at each component's min in O(log n) rounds.
    Convergence = edge multiset fixed point, checked with a single
    count+hash aggregate (no exceptAll shuffle)."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    # every node ever seen — star rounds drop isolated star roots from
    # the edge list's u side, but the contract is one row per node
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def _sig(df: DataFrame):
        # order-independent multiset signature: count + xor of row
        # hashes (xor, not sum — sum overflows long under ANSI mode;
        # rows are distinct() so xor cannot self-cancel a duplicate)
        return df.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)
            ).alias("h"),
        ).first()

    sig = _sig(e)
    for rounds in range(1, max_iter + 1):
        # large-star: neighborhoods of the UNDIRECTED graph; emit
        # (v, min(closed nbhd of u)) for strictly-larger neighbors v
        bidir = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = bidir.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        e = (
            bidir.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # small-star: high→low directed view; re-point u and all its
        # smaller neighbors at min(N(u) ∪ {u})
        mins = e.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        e = (
            e.join(mins, "u")
            .select(F.col("v").alias("u"), "m")
            .unionByName(mins.select(F.col("u"), F.col("m")))
            .filter(F.col("u") != F.col("m"))
            .select("u", F.col("m").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        new_sig = _sig(e)
        if (new_sig.n, new_sig.h) == (sig.n, sig.h):
            labels = (
                nodes.join(
                    e.select(F.col("u").alias("node"), F.col("v").alias("c")),
                    "node",
                    "left",
                )
                .select(
                    "node",
                    F.coalesce(F.col("c"), F.col("node")).alias("component"),
                )
            )
            return labels, rounds
        sig = new_sig
    raise RuntimeError(
        f"connected_components(star) did not converge in {max_iter} rounds"
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
