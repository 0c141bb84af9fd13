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


def query_tokens(query: str) -> list[str]:
    """Tokenize a query with the shared spec; a non-empty placeholder
    when the query has no tokens (isin([]) would be always-false with a
    different plan shape)."""
    import re

    qtokens = [t for t in re.split(TOKEN_SPLIT, query.lower()) if t]
    return qtokens or ["\x00-no-token-\x00"]


def score_candidates(inverted: DataFrame, query: str) -> DataFrame:
    """(id, name, score) for entities sharing ≥1 token with the query."""
    qtokens = query_tokens(query)
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


def fulltext_topk(
    inverted: DataFrame,
    query: str,
    k: int,
    weighted: bool = False,
    n_entities: int | None = None,
) -> DataFrame:
    scored = (
        score_candidates_idf(inverted, query, n_entities=n_entities)
        if weighted
        else score_candidates(inverted, query)
    )
    return scored.orderBy(F.desc("score"), F.asc("name"), F.asc("id")).limit(k)


def score_candidates_idf(
    inverted: DataFrame, query: str, n_entities: int | None = None
) -> DataFrame:
    """(id, name, score): IDF-weighted token-overlap ranking.

    score(query, name) = Σ over matched distinct tokens of
    ``ln(1 + N / df(token))`` — the Lucene-flavoured alternative to the
    plain overlap count (run_rdf_to_kg.py:60-99 ranks via Lucene
    TF-IDF). A rare surname outweighs a ubiquitous honorific ("dr"),
    so ambiguous anchors resolve to the name matching the DISTINCTIVE
    query tokens, where plain overlap ties.

    The document frequencies come from the inverted table itself — one
    extra groupBy over the (already-built, token-partitioned) index,
    restricted to the query's tokens. N is the entity count: pass a
    precomputed ``n_entities`` for repeated querying (it is a property
    of the index, not of the query — recounting it per call would run
    a full distinct-count job each time); at scale df(token) is
    likewise materialized alongside the index at build time. Plain
    overlap remains the default scorer because it is the oracle-pinned
    spec (fulltext_top1).
    """
    qtokens = query_tokens(query)
    if n_entities is None:
        n_entities = inverted.select("id").distinct().count()
    matched = inverted.filter(F.col("token").isin(qtokens))
    df_tbl = matched.groupBy("token").agg(F.countDistinct("id").alias("df"))
    return (
        matched.join(F.broadcast(df_tbl), "token")
        .groupBy("id", "name")
        .agg(
            F.sum(F.log1p(F.lit(float(n_entities)) / F.col("df"))).alias("score")
        )
    )
