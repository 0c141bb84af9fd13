"""Graph statistics (SURVEY.md §2 E2-E6, G4, G6).

DataFrame re-expression of ``get_graph_statistics``
(``/root/reference/kg_rag/utils/graph_utils.py:169-216``): node/edge
counts, distinct relation types, weakly-connected component count +
largest size, average/max total degree.

Fidelity note: the reference folds edges into a plain ``nx.DiGraph``,
so parallel edges with different relation types collapse to one (u, v)
pair. Counts and degrees here are therefore computed over distinct
(src, dst) pairs; ``relation_types`` reports every relation present in
the edge table (the reference would report only each pair's last-won
attribute — order-dependent, so we spec the order-free superset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.operators.cc import connected_components


def degree_table(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Total degree (in+out) per node over distinct (src, dst) pairs."""
    pairs = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    ends = pairs.select(F.col("a").alias("node")).unionByName(
        pairs.select(F.col("b").alias("node"))
    )
    return ends.groupBy("node").agg(F.count("*").alias("degree"))


def graph_statistics(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    with_components: bool = True,
) -> dict:
    """E2-E6/G4 metrics as one dict (driver-side scalars)."""
    all_nodes = (
        nodes.select(F.col(node_col).alias("id"))
        .unionByName(edges.select(F.col("src").alias("id")))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    node_count = all_nodes.count()
    pair_count = edges.select("src", "dst").distinct().count()
    rel_types = [r.rel for r in edges.select("rel").distinct().orderBy("rel").collect()]
    max_deg_row = degree_table(edges).agg(F.max("degree").alias("mx")).first()

    out = {
        "node_count": node_count,
        "edge_count": pair_count,
        "relation_type_count": len(rel_types),
        "relation_types": rel_types,
        "average_degree": (2.0 * pair_count / node_count) if node_count else 0.0,
        "max_degree": max_deg_row["mx"] or 0,
    }
    if with_components:
        # auto variant: a generic stats operator has no diameter
        # knowledge, and plain hash-min raises past 50 rounds on long
        # chains; star/driver dispatch handles any shape
        from kgspark.operators.cc import connected_components_auto

        comp = (
            connected_components_auto(all_nodes, edges, "id")
            .groupBy("component")
            .agg(F.count("*").alias("size"))
            .agg(F.count("*").alias("n"), F.max("size").alias("mx"))
            .first()
        )
        out["connected_component_count"] = comp["n"]
        out["largest_component_size"] = comp["mx"]
    return out
