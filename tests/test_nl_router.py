"""Deterministic NL→shape routing (operators/nl_router.py).

The five canonical few-shot questions from the reference's Cypher
prompt (cypher_generator.py:23-98) must route to their shapes with the
right anchors; routing is pure column expressions, so the whole table
routes in one pass.
"""

from __future__ import annotations

from kgspark.operators import nl_router


def _route_all(spark, questions):
    df = spark.createDataFrame([(q,) for q in questions], ["question"])
    return {
        r.question: (r.shape, r.provider_q, r.location_q)
        for r in nl_router.route_questions(df).collect()
    }


def test_canonical_questions_route_to_their_shapes(spark):
    got = _route_all(spark, nl_router.CANONICAL_QUESTIONS)
    q1, q2, q3, q4, q5 = nl_router.CANONICAL_QUESTIONS
    assert got[q1] == ("shape1", "Dr. Smith", None)
    assert got[q2] == ("shape2", "Dr. Brown", None)
    assert got[q3] == ("shape3", None, "New York")
    assert got[q4] == ("shape4", "Sarah", "Los Angeles")
    assert got[q5] == ("shape5", "Dr. Sarah Johnson", "Los Angeles")


def test_unroutable_question_is_unknown(spark):
    got = _route_all(spark, ["What is the meaning of life?"])
    shape, provider, location = got["What is the meaning of life?"]
    assert shape == "unknown"
    assert provider is None and location is None


def test_lowercase_in_phrase_is_not_a_location(spark):
    """'in the hospital' must not trigger the location shapes."""
    q = "Which patients are treated by Dr. Adams in the hospital?"
    got = _route_all(spark, [q])
    assert got[q][0] == "shape1"
    assert got[q][2] is None


def test_route_and_execute_answers_canonical_questions(spark):
    """End-to-end NL loop on the reference-CSV graph: each canonical
    question routes to its shape and returns exactly what calling the
    shape directly returns."""
    from kgspark.operators import kg_queries as kq
    from kgspark.operators.graph_build import (
        edges_from_triples,
        nodes_from_triples,
    )
    from kgspark.operators.rdf_build import build_triples
    from kgspark.sources.csv_source import read_fact_csv

    triples = build_triples(
        read_fact_csv(spark, "/root/reference/data/healthcare.csv")
    ).localCheckpoint(eager=True)
    nodes = nodes_from_triples(triples).localCheckpoint(eager=True)
    edges = edges_from_triples(triples).localCheckpoint(eager=True)

    got = nl_router.route_and_execute(
        nodes, edges, "Which patients are treated by Dr. Jessica Lee?"
    )
    want = kq.patients_of_provider(nodes, edges, "Dr. Jessica Lee")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0

    agg = nl_router.route_and_execute(
        nodes, edges,
        "For Dr. John Smith in Los Angeles, what is the total number of"
        " patients he treats and what is their average age?",
    )
    want_agg = kq.provider_patient_aggregates(
        nodes, edges, "Dr. John Smith", "Los Angeles"
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, want_agg.collect()))

    import pytest

    with pytest.raises(ValueError, match="no deterministic shape"):
        nl_router.route_and_execute(nodes, edges, "What is the meaning of life?")


def test_route_and_execute_missing_anchor_raises_valueerror(spark):
    """A question that routes to a shape but yields no anchor must get
    the documented ValueError, not an AttributeError from tokenizing
    None (e.g. shape5 with neither provider nor location)."""
    import pytest

    from kgspark.operators import nl_router

    nodes = spark.createDataFrame([("x", "T", "n")], ["id", "type", "name"])
    edges = spark.createDataFrame([("x", "r", "x")], ["src", "rel", "dst"])
    for q in [
        "How many patients are treated in total?",       # shape5, no anchors
        "Which patients are treated by the best doctor?",  # shape1, no provider
    ]:
        with pytest.raises(ValueError, match="no deterministic shape"):
            nl_router.route_and_execute(nodes, edges, q)


def test_batched_dispatch_matches_scalar_per_question(spark):
    """Row-set parity of the grouped distributed dispatcher
    (operators/nl_batch.py) with the scalar execute_shape path, per
    canonical question, on the reference-CSV graph."""
    from kgspark.operators import nl_router
    from kgspark.operators.graph_build import (
        edges_from_triples,
        nodes_from_triples,
    )
    from kgspark.operators.nl_batch import (
        execute_routed,
        execute_routed_grouped,
    )
    from kgspark.operators.rdf_build import build_triples
    from kgspark.sources.csv_source import read_fact_csv

    triples = build_triples(
        read_fact_csv(spark, "/root/reference/data/healthcare.csv")
    ).localCheckpoint(eager=True)
    nodes = nodes_from_triples(triples).localCheckpoint(eager=True)
    edges = edges_from_triples(triples).localCheckpoint(eager=True)

    routed = nl_router.route_questions(
        spark.createDataFrame(
            [(q,) for q in nl_router.CANONICAL_QUESTIONS], ["question"]
        )
    )
    grouped = execute_routed_grouped(nodes, edges, routed)
    routes = {r.question: r for r in routed.collect()}
    n_batched_total = 0
    for q, r in routes.items():
        scalar = nl_router.execute_shape(
            nodes, edges, r.shape, r.provider_q, r.location_q, q
        )
        shape_df = grouped[r.shape]
        batched = shape_df.filter(shape_df.question == q).select(
            *scalar.columns  # same names, scalar column order
        )
        got = sorted(map(tuple, batched.collect()))
        want = sorted(map(tuple, scalar.collect()))
        assert got == want, f"{q}: batched {got} != scalar {want}"
        n_batched_total += len(got)
    assert n_batched_total > 0

    # the unified JSON view carries one row per result row, every
    # question tagged with its routed shape
    uni = execute_routed(nodes, edges, routed)
    assert uni.count() == n_batched_total
    tags = {(r.question, r.shape) for r in uni.select("question", "shape").distinct().collect()}
    assert tags == {(q, r.shape) for q, r in routes.items()}


def test_batched_dispatch_skips_unroutable_and_anchorless(spark):
    """Unknown-shape and anchor-missing questions produce no rows in
    the grouped dispatcher (the scalar path raises; batch callers
    anti-join to find them)."""
    from kgspark.operators import nl_router
    from kgspark.operators.nl_batch import execute_routed_grouped

    nodes = spark.createDataFrame(
        [("p1", "HealthcareProvider", "Dr. Smith", None)],
        "id string, type string, name string, age string",
    )
    edges = spark.createDataFrame(
        [("p1", "TREATS", "p1")], ["src", "rel", "dst"]
    )
    routed = nl_router.route_questions(
        spark.createDataFrame(
            [
                ("What is the meaning of life?",),      # unknown
                ("How many patients are treated in total?",),  # shape5 no anchors
            ],
            ["question"],
        )
    )
    grouped = execute_routed_grouped(nodes, edges, routed)
    assert all(df.count() == 0 for df in grouped.values())
