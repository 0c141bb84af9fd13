"""Weakly-connected components on DataFrames (SURVEY.md §2 G2 ◆).

Re-expresses ``nx.weakly_connected_components``
(``/root/reference/kg_rag/utils/graph_utils.py:191-200``) as an
iterative hash-min label propagation — the GraphFrames-style approach —
because Spark has no native CC primitive and GraphFrames isn't
available in-sandbox.

Algorithm: every node starts labeled with its own id; each round a
node's label becomes the min of its own and all neighbors' labels
(undirected closure of the edge list); converged when no label changes.
Rounds = O(component diameter). Entity-canonicalization graphs
(same-as/alias clusters) have tiny diameters, so this beats the
O(log n) large-star/small-star scheme in practice while staying two
shuffles per round.

Scale notes:
- ``localCheckpoint(eager=True)`` each round truncates the lineage so
  plan size stays O(1) in rounds (classic iterative-Spark pitfall).
- Labels propagate *through* hub nodes in one round, so Zipf-skewed
  degree only affects the join's build side — AQE skew-join splits it.
- The convergence check is an aggregate on the changed-count, one
  action per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_closure(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Symmetrized, deduplicated, self-loop-free edge list (a, b)."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    rev = edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    return fwd.unionByName(rev).filter(F.col("a") != F.col("b")).distinct()


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Assign each node its component id = min node-id in its component.

    Returns ``(id, component)``. Node ids may be any orderable type;
    min is lexicographic for strings, so component ids are stable and
    meaningful (the alphabetically-first member).
    """
    sym = undirected_closure(edges, src, dst)

    # include edge endpoints absent from the node table (NetworkX
    # add_edge auto-creates endpoints, graph_utils.py:128-134)
    all_nodes = (
        nodes.select(F.col(node_col).alias("id"))
        .unionByName(sym.select(F.col("a").alias("id")))
        .distinct()
    )

    assign = all_nodes.select("id", F.col("id").alias("component")).localCheckpoint()
    sym = sym.localCheckpoint()

    for _ in range(max_iterations):
        msgs = sym.join(assign, sym.a == assign.id).select(
            F.col("b").alias("id"), "component"
        )
        new_assign = (
            msgs.unionByName(assign)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_assign.alias("n")
            .join(assign.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        assign = new_assign
        if changed == 0:
            break
    return assign


def connected_components_auto(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    driver_max_edges: int = 500_000,
) -> DataFrame:
    """Size-adaptive CC: tiny graphs are solved driver-side.

    The distributed hash-min loop costs ~4-8 Spark jobs of pure latency
    per iteration — absurd for a same-as graph of a few thousand
    distinct surface forms. If the (deduplicated) edge list fits the
    driver comfortably, collect it, run union-find, and parallelize the
    assignment back; identical output (component = min member id) by
    construction. Beyond the threshold, fall back to the iterative
    DataFrame algorithm.
    """
    spark = nodes.sparkSession
    sym = undirected_closure(edges, src, dst).persist()
    try:
        n_edges = sym.count()
        if n_edges > driver_max_edges:
            return connected_components(nodes, edges, node_col, src, dst)

        pairs = [(r.a, r.b) for r in sym.collect()]
        ids = {r[0] for r in nodes.select(F.col(node_col)).collect()}
        for a, b in pairs:
            ids.add(a)
            ids.add(b)

        parent: dict = {n: n for n in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        groups: dict = {}
        for n in ids:
            groups.setdefault(find(n), []).append(n)
        rows = [
            (n, min(members)) for members in groups.values() for n in members
        ]
        # Output schema tracks the input node-id type so the driver-side
        # and distributed paths agree regardless of which one runs.
        from pyspark.sql.types import StructField, StructType

        id_type = nodes.schema[node_col].dataType
        schema = StructType(
            [StructField("id", id_type), StructField("component", id_type)]
        )
        return spark.createDataFrame(rows, schema=schema)
    finally:
        sym.unpersist()


def component_stats(assign: DataFrame) -> DataFrame:
    """(component_count, largest_component_size) — SURVEY.md E6/G4."""
    sizes = assign.groupBy("component").agg(F.count("*").alias("size"))
    return sizes.agg(
        F.count("*").alias("component_count"),
        F.max("size").alias("largest_component_size"),
    )
