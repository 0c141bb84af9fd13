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

    converged = False
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
            converged = True
            break
    if not converged:
        # hash-min propagates the label one hop per round; returning
        # here would hand back silently-fractured components on any
        # graph whose diameter exceeds the budget
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "hash-min rounds (graph diameter exceeds the budget); use "
            "connected_components_star / connected_components_auto, "
            "which finish in O(log n) rounds regardless of diameter"
        )
    return assign


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: every neighbor v > u re-points to min(Γ(u) ∪ {u})."""
    und = e.select("a", "b").unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = und.groupBy("a").agg(F.min("b").alias("_mb"))
    mins = mins.select("a", F.least("a", "_mb").alias("_m"))
    return (
        und.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: orient edges large→small; u and its ≤-neighbors
    re-point to the minimum of the oriented neighborhood."""
    oriented = e.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).filter(F.col("a") != F.col("b"))
    mins = oriented.groupBy("a").agg(F.min("b").alias("_m"))
    out = (
        oriented.join(mins, "a")
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .unionByName(mins.select(F.col("a"), F.col("_m").alias("b")))
    )
    return out.filter(F.col("a") != F.col("b")).distinct()


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    sym: DataFrame | None = None,
) -> DataFrame:
    """Large-star/small-star CC — O(log n) rounds regardless of diameter.

    The alternating-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): hash-min needs O(diameter)
    rounds — fine for same-as/alias graphs (tiny diameter), pathological
    on chain-shaped web graphs — while each large★/small★ round at least
    halves tree heights. At the fixpoint every edge points node → its
    component minimum. Output identical to ``connected_components``:
    (id, component = min member id).
    """
    # accept a pre-symmetrized (and possibly persisted) closure so the
    # auto-dispatch path doesn't shuffle the edge list a second time
    if sym is None:
        sym = undirected_closure(edges, src, dst)
    # localCheckpoint is EAGER: sym is consumed exactly once, here,
    # while a caller-persisted closure is still cached. all_nodes reads
    # the checkpointed copy (symmetric, so column a covers every
    # endpoint) — not sym — so nothing downstream recomputes the
    # closure after the caller unpersists it.
    e = sym.localCheckpoint()
    all_nodes = (
        nodes.select(F.col(node_col).alias("id"))
        .unionByName(e.select(F.col("a").alias("id")))
        .distinct()
    )
    prev_fp = None
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint()
        fp = e.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("a", "b")).alias("x"),
        ).first()
        fp = (fp.n, fp.x)
        if fp == prev_fp:
            break
        prev_fp = fp

    # Fixpoint edges form stars (node → component min); a node can
    # still carry both (u→m) from one star op in the final round — the
    # min aggregate collapses it. Min nodes / isolated nodes self-map.
    stars = e.groupBy("a").agg(F.min("b").alias("component"))
    return all_nodes.join(stars, all_nodes.id == stars.a, "left").select(
        "id", F.coalesce("component", "id").alias("component")
    )


def connected_components_auto(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    driver_max_edges: int | None = None,
    driver_max_nodes: int | None = None,
) -> DataFrame:
    """Size-adaptive CC: tiny graphs are solved driver-side.

    Thresholds default to 500k edges / 1M nodes, overridable per
    deployment via ``KGSPARK_DRIVER_MAX_EDGES`` /
    ``KGSPARK_DRIVER_MAX_NODES`` (0 forces the distributed arm —
    output is bit-identical either way, tests/test_cc.py).

    The distributed iteration costs ~4-8 Spark jobs of pure latency per
    round — absurd for a same-as graph of a few thousand distinct
    surface forms. If the (deduplicated) edge list fits the driver
    comfortably, collect it, run union-find, and parallelize the
    assignment back; identical output (component = min member id) by
    construction. Beyond the threshold, fall back to the alternating
    large-star/small-star algorithm — O(log n) rounds independent of
    diameter, the right default for graphs whose shape is unknown
    (hash-min ``connected_components`` stays available for callers who
    know their diameter is tiny).
    """
    from kgspark.runtime import env_int

    if driver_max_edges is None:
        driver_max_edges = env_int("KGSPARK_DRIVER_MAX_EDGES", 500_000)
    if driver_max_nodes is None:
        driver_max_nodes = env_int("KGSPARK_DRIVER_MAX_NODES", 1_000_000)
    spark = nodes.sparkSession
    sym = undirected_closure(edges, src, dst).persist()
    try:
        # Both counts gate the driver path: a same-as graph can have a
        # tiny edge list over an enormous mostly-isolated node set (50M
        # self-resolved mentions, a few thousand merges) — the node
        # collect below would OOM the driver while the edge guard waves
        # it through. Count-only probes, no row transfer until both fit.
        n_edges = sym.count()
        if n_edges > driver_max_edges or nodes.count() > driver_max_nodes:
            return connected_components_star(
                nodes, edges, node_col, src, dst, sym=sym
            )

        # Arrow for both driver transfers (guide §6): toPandas /
        # pandas-createDataFrame move the ~10⁴-10⁵ id rows as columnar
        # batches instead of pickled Row objects — measured ~0.5-1 s
        # saved per CC call at sf1.0 (50k nodes), and this arm sits
        # inside neardup_clusters, corpus_filter, canonicalization and
        # the stats/query paths. Node ids are non-null by construction,
        # so the int64 column never degrades to float64.
        import pandas as pd

        sym_pdf = sym.toPandas()
        pairs = list(zip(sym_pdf["a"], sym_pdf["b"]))
        ids = set(nodes.select(F.col(node_col).alias("id")).toPandas()["id"])
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
        if not rows:
            return spark.createDataFrame([], schema=schema)
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["id", "component"]), schema=schema
        )
    finally:
        sym.unpersist()


def component_stats(assign: DataFrame) -> DataFrame:
    """(component_count, largest_component_size) — SURVEY.md E6/G4."""
    sizes = assign.groupBy("component").agg(F.count("*").alias("size"))
    return sizes.agg(
        F.count("*").alias("component_count"),
        F.max("size").alias("largest_component_size"),
    )
