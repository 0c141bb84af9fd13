"""Metadata + summary enrichment (SURVEY.md §2 B9, B10, H2, H3, H4, C6).

The reference's transformer subclasses decorate extracted nodes/edges
with provenance and an LLM summary of the document head
(``kg_rag/utils/graph_transformers.py:96-171,308-364,401-638``):

- node-id suffixing ``f"{id}_{source}"`` + ``original_id`` /
  ``source_document`` props (B9/H2) — a pure column expression here;
- content truncation to 1500 chars + "..." (B10);
- per-document summary, LRU-cached in the reference (C6) — here the
  summary is computed once per document row (grouping replaces the
  cache) and joined onto that document's nodes/edges;
- the LLM summary becomes a deterministic extractive one: the first
  two sentences of the truncated content (spec'd, reproducible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRUNCATE_AT = 1500
# leading-sentences pattern, RE2-compatible (no lookbehind) so the
# DuckDB oracle can mirror it exactly
SUMMARY_PATTERN = r"^((?:[^.!?]*[.!?]+\s*){1,2})"


def truncate_content_col(text: Column, limit: int = TRUNCATE_AT) -> Column:
    """B10: head of the document + '...' marker when truncated
    (graph_transformers.py:318-323)."""
    return F.when(
        F.length(text) > limit, F.concat(F.substring(text, 1, limit), F.lit("..."))
    ).otherwise(text)


def extractive_summary_col(text: Column) -> Column:
    """H3: deterministic stand-in for the LLM summary — the first two
    sentences of the truncated content (whole head if no sentence
    boundary exists)."""
    trunc = truncate_content_col(text)
    head = F.trim(F.regexp_extract(trunc, SUMMARY_PATTERN, 1))
    return F.coalesce(F.nullif(head, F.lit("")), trunc)


def suffix_ids(
    nodes: DataFrame,
    source_col: str = "source_document",
    id_col: str = "id",
) -> DataFrame:
    """B9/H2: ``id → f"{id}_{source}"`` keeping ``original_id``; a pure
    function of (id, source), so edge endpoints remap with the same
    expression — no join (graph_transformers.py:107-169). A NULL source
    suffixes as 'unknown' (the reference's default for missing
    metadata) — concat_ws alone would skip the NULL and leave the raw
    id, re-creating exactly the cross-document collisions suffixing
    exists to prevent."""
    return nodes.withColumn("original_id", F.col(id_col)).withColumn(
        id_col,
        F.concat_ws(
            "_", F.col(id_col), F.coalesce(F.col(source_col), F.lit("unknown"))
        ),
    )


def with_document_summaries(
    items: DataFrame,
    documents: DataFrame,
    doc_key: str = "source_document",
    doc_id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C6/H3: compute each document's summary once, broadcast-join it
    onto the document's extracted nodes/edges (replaces the LRU cache)."""
    summaries = documents.select(
        F.col(doc_id_col).alias(doc_key),
        extractive_summary_col(F.col(text_col)).alias("document_summary"),
    )
    return items.join(F.broadcast(summaries), doc_key, "left")


def extract_answer_col(text: Column) -> Column:
    """B11: answer-extraction regex cascade
    (kg_rag/methods/cypher_based/kg_rag.py:185-212), merged into one
    deterministic tier order: the reference's numeric patterns first
    (signed decimals INCLUDED — '[^\\s.,;]+' alone would truncate
    'answer is 3.5' to '3'), then the general word-answer tiers, then
    the reference's bare-number fallback; null instead of echoing the
    whole text (the one deliberate divergence — an unextractable
    answer should be visibly absent, not silently the input)."""
    tiers = [
        r"(?i)answer\s*(?:is|:)\s*(-?\d+(?:\.\d+)?)",
        r"(?i)(-?\d+(?:\.\d+)?)\s*%",
        r"(?i)(-?\d+(?:\.\d+)?)\s*(?:million|billion|dollars|USD)",
        r"(?i)(?:value|amount|total)\s*(?:of|is|:)\s*(-?\d+(?:\.\d+)?)",
        r"(?i)answer\s+is\s+([^\s.,;]+)",
        r"(?i)answer:\s*([^\s.,;]+)",
        r"(-?\d+(?:\.\d+)?)",
    ]
    return F.coalesce(
        *[F.nullif(F.regexp_extract(text, p, 1), F.lit("")) for p in tiers]
    )
