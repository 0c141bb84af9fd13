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
