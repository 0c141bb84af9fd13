"""Triple-fidelity gate (BASELINE.json: P/R >= 0.95 vs reference triples).

Three layers:
1. golden oracle == the reference's checked-in Turtle output (exact);
2. Spark pipeline == golden oracle on the reference's own CSV (exact);
3. Spark pipeline == golden oracle on an adversarial edge-case fixture
   (multi-values, blanks, conflicting first-wins, bad ages, unicode).
"""

from __future__ import annotations

import csv

import pytest

from kgspark import golden
from kgspark.operators.rdf_build import build_triples, ontology_df
from kgspark.sources.csv_source import read_fact_csv
from tests.conftest import triple_set

REF_CSV = "/root/reference/data/healthcare.csv"
REF_TTL = "/root/reference/data/rdf/healthcare_data.ttl"
REF_ONT_TTL = "/root/reference/data/rdf/healthcare_ontology.ttl"


def _ref_rows():
    with open(REF_CSV, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


EDGE_ROWS = [
    # normal
    dict(Provider="Dr. Ann Lee", Patient="Bob Stone", Specialization="Cardiology",
         Location="Boston", Bio="bio one", Patient_Age="70", Patient_Gender="M",
         Patient_Condition="Asthma"),
    # dropped: blank provider / blank patient
    dict(Provider="", Patient="X", Specialization="s", Location="l", Bio="b",
         Patient_Age="1", Patient_Gender="g", Patient_Condition="c"),
    dict(Provider="Dr. Ann Lee", Patient="   ", Specialization="s", Location="l",
         Bio="b", Patient_Age="1", Patient_Gender="g", Patient_Condition="c"),
    # multi-valued cells with mixed separators + empties
    dict(Provider="Dr. Ann Lee", Patient="Bob Stone",
         Specialization="Neurology| Oncology ;", Location="NYC, ,LA|",
         Bio="bio two (ignored: first wins)", Patient_Age="71 (ignored)",
         Patient_Gender="F (ignored)", Patient_Condition="Flu|Cold;Asthma"),
    # split fallback: separators only → raw cell kept verbatim
    dict(Provider="Dr Müller-Żółć", Patient="Émile  Q.", Specialization=",,",
         Location="", Bio="", Patient_Age="not-a-number", Patient_Gender="",
         Patient_Condition=",;"),
    # first non-empty wins later: fills gender/age left empty above
    dict(Provider="Dr Müller-Żółć", Patient="Émile Q.", Specialization="",
         Location="Paris", Bio="later bio", Patient_Age="066",
         Patient_Gender="F", Patient_Condition=""),
    # provider/patient name collision on slug, duplicate rows
    dict(Provider="Bob  Stone", Patient="Bob Stone", Specialization="Self",
         Location="Boston", Bio="provider-bob bio", Patient_Age="0042",
         Patient_Gender="M", Patient_Condition="None"),
    dict(Provider="Bob  Stone", Patient="Bob Stone", Specialization="Self",
         Location="Boston", Bio="provider-bob bio", Patient_Age="0042",
         Patient_Gender="M", Patient_Condition="None"),
    # Unicode/control whitespace padding: Python str.strip() removes
    # tabs, newlines, NBSP — F.trim would not (regression: trim parity)
    dict(Provider="Dr. Ann Lee\t", Patient=" Bob Stone\n",
         Specialization=" Cardiology\t|  Oncology ", Location="\tBoston",
         Bio=" padded bio\t", Patient_Age="\t70 ", Patient_Gender=" M\n",
         Patient_Condition=" Asthma\t; Flu\n"),
    # row dropped: patient is whitespace-only under Python semantics
    dict(Provider="Dr. Ann Lee", Patient="\t \n", Specialization="s",
         Location="l", Bio="b", Patient_Age="1", Patient_Gender="g",
         Patient_Condition="c"),
]


def _spark_triples_from_rows(spark, rows):
    fact_rows = [
        {**{c: r.get(c, "") for c in golden.FACT_COLUMNS}, "row_idx": i + 1}
        for i, r in enumerate(rows)
    ]
    schema = ", ".join(f"{c} string" for c in golden.FACT_COLUMNS) + ", row_idx long"
    df = spark.createDataFrame(fact_rows, schema=schema)
    return triple_set(build_triples(df))


def test_golden_matches_reference_ttl():
    produced = golden.fact_rows_to_triples(_ref_rows())
    expected = golden.read_turtle(REF_TTL)
    p, r = golden.precision_recall(produced, expected)
    assert (p, r) == (1.0, 1.0)


def test_ontology_matches_reference_ttl(spark):
    expected = golden.read_turtle(REF_ONT_TTL)
    assert golden.ontology_triples() == expected
    assert triple_set(ontology_df(spark)) == expected


def test_spark_matches_reference_ttl_via_csv_scan(spark):
    produced = triple_set(build_triples(read_fact_csv(spark, REF_CSV)))
    expected = golden.read_turtle(REF_TTL)
    p, r = golden.precision_recall(produced, expected)
    assert (p, r) == (1.0, 1.0)


def test_spark_matches_golden_on_edge_cases(spark):
    produced = _spark_triples_from_rows(spark, EDGE_ROWS)
    expected = golden.fact_rows_to_triples(EDGE_ROWS)
    assert produced == expected


def test_idempotent_rebuild(spark):
    a = _spark_triples_from_rows(spark, EDGE_ROWS)
    b = _spark_triples_from_rows(spark, EDGE_ROWS + EDGE_ROWS[-1:])  # extra dup row
    assert a == b


@pytest.mark.parametrize(
    ("raw", "slug"),
    [
        ("Dr. John Smith", "Dr_John_Smith"),
        ("  a   b  ", "a_b"),
        (",,", "unnamed"),
        ("", "unnamed"),
        (None, "unnamed"),
        ("Żółć—déjà vu", "Żółć_déjà_vu"),
        ("__x__", "x"),
    ],
)
def test_slugify_cases(raw, slug):
    assert golden.slugify(raw) == slug
