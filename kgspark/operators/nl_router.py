"""Deterministic NL-question → query-shape router (I2-lite).

The reference generates Cypher from natural language with an LLM
(cypher_generator.py:179-204); its prompt carries five few-shot
examples (cypher_generator.py:23-98) that define the query shapes the
system actually answers.  This module is the LLM-free counterpart: a
keyword/pattern router that classifies a question into one of those
five shapes and extracts the anchor strings (provider / location) the
shape needs.  The five canonical example questions are the test set.

Everything is pure Column expressions (``rlike`` + ``regexp_extract``
+ ``when`` chains), so routing runs distributed over a DataFrame of
questions — a million NL queries route in one codegen'd stage, no
Python in the loop.  Patterns are restricted to syntax shared by Java
regex and RE2 so the DuckDB oracle mirrors them verbatim.

Shapes (cypher_generator.py few-shot numbering):
  shape1  provider → TREATS patients
  shape2  provider → SPECIALIZES_IN specializations
  shape3  location ← LOCATED_AT providers (reverse, DISTINCT)
  shape4  provider+location conjunctive 2-hop → patients
  shape5  provider+location → count(DISTINCT patients), avg(age)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The five canonical questions from the reference's few-shot prompt
# (cypher_generator.py:25, 38, 51, 64, 83).
CANONICAL_QUESTIONS: list[str] = [
    "Which patients are treated by Dr. Smith?",
    "What specialization does Dr. Brown have?",
    "Which healthcare providers are located in New York?",
    "Which patients are treated by healthcare providers named Sarah"
    " located in Los Angeles?",
    "For Dr. Sarah Johnson in Los Angeles, what is the total number of"
    " patients she treats and what is their average age?",
]

# Routing patterns (case-insensitive where noted). Order matters:
# aggregation outranks joins, specialization outranks the generic
# patient shapes, the conjunctive 2-hop outranks its single-anchor
# halves. Mirrored 1:1 in oracle_case_sql().
_P_AGG = r"(?i)(total number|how many|average|avg\b)"
_P_SPEC = r"(?i)specializ"
_P_PATIENTS = r"(?i)patients?"
# Case-sensitive on purpose: a location anchor is a TitleCase run
# after a standalone "in" — '(?i)' here would false-positive on any
# lowercase "in the ..." phrase.
_P_LOCATED = r"\bin\s+[A-Z]"
# Anchor extraction: a "Dr."-prefixed TitleCase name, or a bare name
# after "named"; a TitleCase run after "in"/"located in".
_P_PROVIDER_DR = r"(Dr\.?\s*[A-Z][a-zA-Z]*(?:\s[A-Z][a-zA-Z]*)*)"
_P_PROVIDER_NAMED = r"named\s+([A-Z][a-zA-Z]*)"
_P_LOCATION = r"\bin\s+([A-Z][a-zA-Z]*(?:\s[A-Z][a-zA-Z]*)*)"


def shape_col(q: Column) -> Column:
    """Shape id ('shape1'..'shape5', or 'unknown') for a question."""
    return (
        F.when(q.rlike(_P_AGG), F.lit("shape5"))
        .when(q.rlike(_P_SPEC), F.lit("shape2"))
        .when(q.rlike(_P_PATIENTS) & q.rlike(_P_LOCATED), F.lit("shape4"))
        .when(q.rlike(_P_LOCATED), F.lit("shape3"))
        .when(q.rlike(_P_PATIENTS), F.lit("shape1"))
        .otherwise(F.lit("unknown"))
    )


def provider_anchor_col(q: Column) -> Column:
    """Provider anchor text ("Dr. Smith", "Sarah"), NULL if absent."""
    return F.coalesce(
        F.nullif(F.regexp_extract(q, _P_PROVIDER_DR, 1), F.lit("")),
        F.nullif(F.regexp_extract(q, _P_PROVIDER_NAMED, 1), F.lit("")),
    )


def location_anchor_col(q: Column) -> Column:
    """Location anchor text ("New York"), NULL if absent."""
    return F.nullif(F.regexp_extract(q, _P_LOCATION, 1), F.lit(""))


def route_local(question: str) -> tuple[str, str | None, str | None]:
    """Driver-side twin of ``route_questions`` for a single question
    (CPython ``re``; the patterns are restricted to RE2-shared syntax,
    so the three engines — Spark, DuckDB, this — agree). Used to build
    the execution oracle at registration time; the Spark router remains
    the runtime path."""
    import re

    def has(p: str) -> bool:
        return re.search(p, question) is not None

    if has(_P_AGG):
        shape = "shape5"
    elif has(_P_SPEC):
        shape = "shape2"
    elif has(_P_PATIENTS) and has(_P_LOCATED):
        shape = "shape4"
    elif has(_P_LOCATED):
        shape = "shape3"
    elif has(_P_PATIENTS):
        shape = "shape1"
    else:
        shape = "unknown"

    def extract(p: str) -> str | None:
        m = re.search(p, question)
        return m.group(1) if m and m.group(1) else None

    provider = extract(_P_PROVIDER_DR) or extract(_P_PROVIDER_NAMED)
    location = extract(_P_LOCATION)
    return shape, provider, location


def route_questions(df: DataFrame, question_col: str = "question") -> DataFrame:
    """Append (shape, provider_q, location_q) routing columns."""
    q = F.col(question_col)
    return df.select(
        "*",
        shape_col(q).alias("shape"),
        provider_anchor_col(q).alias("provider_q"),
        location_anchor_col(q).alias("location_q"),
    )


def oracle_case_sql(qexpr: str) -> str:
    """DuckDB mirror of shape/anchor routing for an expression ``qexpr``.

    Returns a SELECT-list fragment producing (shape, provider_q,
    location_q) with identical semantics (RE2 on both engines after
    DuckDB's regexp_matches; '(?i)' inline flags are RE2-native).
    """
    def m(pat: str) -> str:
        return f"regexp_matches({qexpr}, '{pat}')"

    shape = (
        f"CASE WHEN {m(_P_AGG)} THEN 'shape5' "
        f"WHEN {m(_P_SPEC)} THEN 'shape2' "
        f"WHEN {m(_P_PATIENTS)} AND {m(_P_LOCATED)} THEN 'shape4' "
        f"WHEN {m(_P_LOCATED)} THEN 'shape3' "
        f"WHEN {m(_P_PATIENTS)} THEN 'shape1' "
        f"ELSE 'unknown' END"
    )
    provider = (
        f"coalesce(nullif(regexp_extract({qexpr}, '{_P_PROVIDER_DR}', 1), ''), "
        f"nullif(regexp_extract({qexpr}, '{_P_PROVIDER_NAMED}', 1), ''))"
    )
    location = f"nullif(regexp_extract({qexpr}, '{_P_LOCATION}', 1), '')"
    return (
        f"{shape} AS shape, {provider} AS provider_q, {location} AS location_q"
    )


# Shape id → executor over the materialized (nodes, edges) graph.
# Closes the reference's ask-a-question loop (kg_rag.py run_cypher_rag)
# without the LLM: route_question() classifies + extracts anchors, the
# matched shape runs as its DataFrame plan.

def execute_shape(
    nodes: DataFrame,
    edges: DataFrame,
    shape: str,
    provider_q: str | None,
    location_q: str | None,
    question: str = "",
) -> DataFrame:
    """Dispatch an already-routed (shape, anchors) triple to its query
    plan. Raises ValueError when the shape is unknown or a required
    anchor is missing — callers that routed a whole question table
    distributed (``route_questions`` + collect) dispatch through this
    directly, paying zero extra Spark jobs per question."""
    from kgspark.operators import kg_queries as kq

    # A shape whose required anchors didn't extract is NOT covered: e.g.
    # 'How many patients are treated in total?' routes to shape5 but has
    # no provider/location anchor — dispatching anyway would crash the
    # executor's tokenizer on None. Same ValueError as the unknown arm.
    needs = {
        "shape1": (provider_q,),
        "shape2": (provider_q,),
        "shape3": (location_q,),
        "shape4": (provider_q, location_q),
        "shape5": (provider_q, location_q),
    }
    if shape in needs and any(a is None for a in needs[shape]):
        raise ValueError(
            f"no deterministic shape covers {question!r} (routed {shape} "
            "but a required anchor is missing); the reference delegates "
            "such questions to its LLM generator"
        )
    if shape == "shape1":
        return kq.patients_of_provider(nodes, edges, provider_q)
    if shape == "shape2":
        return kq.specializations_of_provider(nodes, edges, provider_q)
    if shape == "shape3":
        return kq.providers_at_location(nodes, edges, location_q)
    if shape == "shape4":
        return kq.patients_of_provider_at_location(
            nodes, edges, provider_q, location_q
        )
    if shape == "shape5":
        return kq.provider_patient_aggregates(
            nodes, edges, provider_q, location_q
        )
    raise ValueError(
        f"no deterministic shape covers {question!r} (routed {shape}); "
        "the reference delegates such questions to its LLM generator"
    )


def route_and_execute(
    nodes: DataFrame, edges: DataFrame, question: str
) -> DataFrame:
    """Answer a natural-language question against the KG: route it to
    one of the five implemented query shapes and execute that shape
    with the extracted anchors. Raises ValueError for questions no
    shape covers (the reference would fall back to the LLM here).

    Routing itself is the same pure-expression logic as
    ``route_questions`` — this convenience evaluates it driver-side for
    a single question (one tiny Spark job). Batch workloads use the
    grouped distributed dispatcher instead
    (``operators/nl_batch.execute_routed_grouped``): route the whole
    question table with ``route_questions``, then execute grouped by
    shape — ≤5 plans for any number of questions, no per-question
    driver loop.
    """
    spark = nodes.sparkSession
    row = route_questions(
        spark.createDataFrame([(question,)], ["question"])
    ).first()
    return execute_shape(
        nodes, edges, row.shape, row.provider_q, row.location_q, question
    )
