"""Property-graph materialization (SURVEY.md §2 G1, A5-A7, I1).

Turns a triples DataFrame into the canonical entity-node and edge
tables the reference materializes into Neo4j
(``/root/reference/scripts/build_cypher_graph.py:21-79``,
``run_rdf_to_kg.py:31-47``):

- node identity: the entity URI (MERGE-by-name semantics, since the
  URI is a pure function of the name slug)
- node props pivoted into columns (name, bio, age, gender, condition)
  for pruning/pushdown instead of a map
- edge uniqueness on (src, rel, dst) (build_cypher_graph.py:62-79)
- NetworkX ``add_edge`` auto-creates endpoints (graph_utils.py:128-134)
  → node set = typed subjects ∪ edge endpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.constants import (
    KIND_URI,
    P_AGE,
    P_BIO,
    P_CONDITION,
    P_GENDER,
    P_NAME,
    RDF_TYPE,
)

def edges_from_triples(triples: DataFrame) -> DataFrame:
    """(src, rel, dst) — object-property triples, deduplicated (C5)."""
    return (
        triples.filter((F.col("obj_kind") == KIND_URI) & (F.col("pred") != RDF_TYPE))
        .select(
            F.col("subj").alias("src"),
            F.col("pred").alias("rel"),
            F.col("obj").alias("dst"),
        )
        .dropDuplicates(["src", "rel", "dst"])
    )


def nodes_from_triples(triples: DataFrame) -> DataFrame:
    """Canonical node table: (id, type, name, bio, age, gender, condition).

    Pivot of datatype-property triples; `type` from rdf:type triples;
    union with bare edge endpoints (untyped, NetworkX-style).
    Multi-valued predicates (condition) collapse deterministically to
    the min lexical value; `conditions` keeps the full sorted set.
    """
    types = (
        triples.filter(F.col("pred") == RDF_TYPE)
        .groupBy("subj")
        .agg(F.min("obj").alias("type"))
    )
    prop_map = {P_NAME: "name", P_BIO: "bio", P_AGE: "age", P_GENDER: "gender", P_CONDITION: "condition"}
    props = (
        triples.filter(F.col("pred").isin(list(prop_map)))
        .groupBy("subj")
        .pivot("pred", list(prop_map))
        .agg(F.min("obj"))
    )
    for uri, name in prop_map.items():
        props = props.withColumnRenamed(uri, name)

    conds = (
        triples.filter(F.col("pred") == P_CONDITION)
        .groupBy("subj")
        .agg(F.array_sort(F.collect_set("obj")).alias("conditions"))
    )

    endpoints = edges_from_triples(triples)
    all_ids = (
        types.select("subj")
        .unionByName(endpoints.select(F.col("src").alias("subj")))
        .unionByName(endpoints.select(F.col("dst").alias("subj")))
        .distinct()
    )
    return (
        all_ids.join(types, "subj", "left")
        .join(props, "subj", "left")
        .join(conds, "subj", "left")
        .withColumnRenamed("subj", "id")
        .withColumn("age_int", F.col("age").try_cast("int"))
    )


def graph_schema_summary(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Schema introspection (I1): distinct (src_type, rel, dst_type)
    patterns, the DataFrame analog of ``apoc.meta.schema``
    (cypher_generator.py:140-177)."""
    n = nodes.select("id", "type")
    return (
        edges.join(n.withColumnRenamed("id", "src").withColumnRenamed("type", "src_type"), "src")
        .join(n.withColumnRenamed("id", "dst").withColumnRenamed("type", "dst_type"), "dst")
        .select("src_type", "rel", "dst_type")
        .distinct()
    )
