"""Entity linking: alias dictionary + embedding-cosine fallback (H5 ◆, D6).

Three-tier resolution of provider mentions, the web-scale analog of the
reference's exact-name ``uri_cache``/Neo4j-MERGE identity
(build_rdf.py:129-136, build_cypher_graph.py:22-27):

1. exact   — mention already a canonical name;
2. alias   — broadcast map-side join against the alias dictionary;
3. embedding — deterministic char-n-gram feature-hash vectors (Arrow
   pandas UDF, md5-based hashing) + cosine top-1 against candidates,
   blocked by shared surname-ish token so no cross join materializes.

Unresolved mentions keep their surface form (they become their own
entity) — recall favoring precision, threshold 0.60.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType
from pyspark.sql.window import Window

from kgspark.operators.fulltext import tokenize_col
from kgspark.operators.similarity import cosine_col

EMBED_DIM = 64


def _char_ngram_vector(name: str, dim: int = EMBED_DIM, n: int = 3) -> np.ndarray:
    s = f"^{(name or '').lower()}$"
    v = np.zeros(dim, dtype=np.float64)
    for i in range(max(len(s) - n + 1, 0)):
        g = s[i : i + n]
        h = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
        v[h % dim] += 1.0
    norm = float(np.sqrt((v * v).sum()))
    return v / norm if norm else v


@pandas_udf(ArrayType(DoubleType()))
def name_embedding_udf(names: pd.Series) -> pd.Series:
    return names.map(lambda s: _char_ngram_vector(s).tolist())


def _blocking_tokens(name_col) -> "F.Column":
    """Lowercased tokens minus the ubiquitous honorific (hub-token guard:
    blocking on 'dr' would put every provider in one block)."""
    return F.filter(tokenize_col(name_col), lambda t: t != F.lit("dr"))


def resolve_mentions(
    mentions: DataFrame,
    aliases: DataFrame,
    canonicals: DataFrame,
    threshold: float = 0.75,
) -> DataFrame:
    """mentions(name) → (name, resolved, method).

    ``aliases(alias, canonical)`` and ``canonicals(canonical)`` are
    dimension tables — broadcast both.
    """
    m = mentions.select("name").distinct()
    canon = canonicals.select(F.col("canonical")).distinct()

    exact = m.join(
        F.broadcast(canon), m.name == canon.canonical, "left"
    ).select("name", F.col("canonical").alias("r_exact"))

    al = aliases.select(F.col("alias"), F.col("canonical").alias("r_alias"))
    step2 = exact.join(F.broadcast(al), exact.name == al["alias"], "left").select(
        "name", "r_exact", "r_alias"
    )

    resolved_now = step2.filter(
        F.col("r_exact").isNotNull() | F.col("r_alias").isNotNull()
    ).select(
        "name",
        F.coalesce("r_exact", "r_alias").alias("resolved"),
        F.when(F.col("r_exact").isNotNull(), "exact").otherwise("alias").alias("method"),
    )

    # tier 3: embedding cosine, token-blocked
    unresolved = step2.filter(
        F.col("r_exact").isNull() & F.col("r_alias").isNull()
    ).select("name")
    cand = canon.select(
        F.col("canonical"),
        name_embedding_udf(F.col("canonical")).alias("c_vec"),
        F.explode(_blocking_tokens(F.col("canonical"))).alias("block"),
    )
    men = unresolved.select(
        "name",
        name_embedding_udf(F.col("name")).alias("m_vec"),
        F.explode(_blocking_tokens(F.col("name"))).alias("block"),
    )
    scored = (
        men.join(F.broadcast(cand), "block")
        .withColumn("cos", cosine_col(F.col("m_vec"), F.col("c_vec")))
        .filter(F.col("cos") >= threshold)
    )
    w = Window.partitionBy("name").orderBy(F.desc("cos"), F.asc("canonical"))
    embedded = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("name", F.col("canonical").alias("resolved"), F.lit("embedding").alias("method"))
    )
    leftovers = unresolved.join(embedded, "name", "left_anti").select(
        "name", F.col("name").alias("resolved"), F.lit(None).cast("string").alias("method")
    )
    return resolved_now.unionByName(embedded).unionByName(leftovers)


def sameas_edges(resolution: DataFrame) -> DataFrame:
    """(src, dst) same-as pairs from a resolution table (mention↔canonical)."""
    return resolution.filter(F.col("name") != F.col("resolved")).select(
        F.col("name").alias("src"), F.col("resolved").alias("dst")
    )


def canonicalize_by_components(
    resolution: DataFrame, canonicals: DataFrame
) -> DataFrame:
    """G3 ◆: connected-components canonicalization over same-as edges.

    Merges coreferent surface forms into one canonical node: CC over the
    same-as graph, representative = the component's (unique) member that
    is a known canonical name, else the min member. Returns
    (name, canonical_id).
    """
    from kgspark.operators.cc import connected_components

    edges = sameas_edges(resolution)
    nodes = resolution.select(F.col("name").alias("id"))
    assign = connected_components(nodes, edges, "id")

    canon = canonicals.select(F.col("canonical")).distinct()
    rep = (
        assign.join(canon, assign.id == canon.canonical, "left")
        .groupBy("component")
        .agg(
            F.min("canonical").alias("canon_rep"),
            F.min("id").alias("min_rep"),
        )
        .select(
            "component", F.coalesce("canon_rep", "min_rep").alias("canonical_id")
        )
    )
    return assign.join(rep, "component").select(
        F.col("id").alias("name"), "canonical_id"
    )


def link_facts(
    facts: DataFrame,
    aliases: DataFrame,
    canonicals: DataFrame | None = None,
    name_col: str = "Provider",
) -> DataFrame:
    """Replace ``facts[name_col]`` with its canonical form (CC-based).

    ``canonicals(canonical)`` is the entity inventory; deriving it from
    the alias table alone under-covers entities that have no alias
    forms (they would then be embedding-matched against *other*
    entities — a precision bug), so pass the full inventory.
    """
    mentions = facts.select(F.col(name_col).alias("name"))
    if canonicals is None:
        canonicals = aliases.select("canonical")
    resolution = resolve_mentions(mentions, aliases, canonicals)
    mapping = canonicalize_by_components(resolution, canonicals)
    out = (
        facts.join(
            F.broadcast(mapping), facts[name_col] == mapping.name, "left"
        )
        .withColumn(name_col, F.coalesce("canonical_id", name_col))
        .drop("name", "canonical_id")
    )
    return out
