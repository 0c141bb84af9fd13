"""Full-text entity lookup (SURVEY.md §2 B6/A7/F1).

The reference delegates to Neo4j's Lucene full-text indexes
(``/root/reference/scripts/run_rdf_to_kg.py:60-99``) and anchors every
query with ``db.index.fulltext.queryNodes(...) ORDER BY score DESC
LIMIT 1`` (``cypher_generator.py:26-29`` et al.). Lucene-identical
scoring is a non-goal; our scorer is the spec:

    score(query, name) = number of distinct query tokens that occur in
    the tokenized name; ties broken by (name ASC, id ASC).

The "index" is a precomputed token inverted table — at scale this is
written once, partitioned by token, and the per-query lookup is a
broadcast of the (tiny) query-token set followed by a semi-join, so no
full scan of the entity table happens per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"[^a-z0-9]+"


def tokenize_col(col: Column) -> Column:
    """Lowercase alnum tokens; the shared tokenizer spec."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda x: x != F.lit(""))


def build_inverted_index(
    entities: DataFrame, id_col: str = "id", text_col: str = "name"
) -> DataFrame:
    """(token, id, name) inverted table — one row per distinct token per entity."""
    return entities.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("name"),
        F.explode(F.array_distinct(tokenize_col(F.col(text_col)))).alias("token"),
    )


def score_candidates(inverted: DataFrame, query: str) -> DataFrame:
    """(id, name, score) for entities sharing ≥1 token with the query."""
    import re

    qtokens = [t for t in re.split(TOKEN_SPLIT, query.lower()) if t]
    if not qtokens:
        qtokens = ["\x00-no-token-\x00"]
    return (
        inverted.filter(F.col("token").isin(qtokens))
        .groupBy("id", "name")
        .agg(F.countDistinct("token").alias("score"))
    )


def fulltext_top1(inverted: DataFrame, query: str) -> DataFrame:
    """The anchor op: best-matching entity, deterministic tie-break.

    orderBy().limit(1) (not a global window): Catalyst plans it as
    TakeOrderedAndProject — per-partition top-1 then a 1-row merge —
    instead of sorting all candidates in a single partition.
    """
    return (
        score_candidates(inverted, query)
        .orderBy(F.desc("score"), F.asc("name"), F.asc("id"))
        .limit(1)
    )


def fulltext_topk(inverted: DataFrame, query: str, k: int) -> DataFrame:
    return (
        score_candidates(inverted, query)
        .orderBy(F.desc("score"), F.asc("name"), F.asc("id"))
        .limit(k)
    )
