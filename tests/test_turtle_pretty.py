"""Byte-exact Turtle emission (VERDICT r4 item 8).

The reference builds its RDF with rdflib and checks the pretty-printed
Turtle into the repo (``scripts/build_rdf.py:114-118`` →
``data/rdf/healthcare_data.ttl`` / ``healthcare_ontology.ttl``).
Round 4 closed set-equality (P/R = 1.0); this suite closes
*file*-equality: serializing our pipeline's triples reproduces the
checked-in files byte-for-byte, with no rdflib in the sandbox.

Layers:
1. pure serializer over the golden oracle's triples == checked-in bytes
   (both files, exact);
2. our Spark pipeline's triples through the DataFrame wrapper == the
   checked-in data file bytes (end-to-end);
3. round-trip: ``read_turtle`` over our pretty output returns the
   identical triple set (self-consistency independent of the reference);
4. format edge rules pinned individually (prefix-usage tracking,
   digit-start locals, plain-integer literals) so a future format
   regression localizes.
"""

from __future__ import annotations

import csv

from kgspark import golden
from kgspark.constants import BASE, KIND_LITERAL, KIND_URI, RDF_TYPE, RDFS_CLASS, XSD_NS
from kgspark.operators.rdf_build import build_triples
from kgspark.sources.csv_source import read_fact_csv
from kgspark.sources.turtle_sink import serialize_turtle_pretty, write_turtle_pretty

REF_CSV = "/root/reference/data/healthcare.csv"
REF_TTL = "/root/reference/data/rdf/healthcare_data.ttl"
REF_ONT_TTL = "/root/reference/data/rdf/healthcare_ontology.ttl"


def _ref_bytes(path: str) -> str:
    with open(path, encoding="utf-8") as f:
        return f.read()


def _golden_data_triples() -> set[golden.Triple]:
    with open(REF_CSV, newline="", encoding="utf-8") as f:
        return golden.fact_rows_to_triples(list(csv.DictReader(f)))


def test_ontology_byte_identical():
    ours = serialize_turtle_pretty(sorted(golden.ontology_triples()))
    assert ours == _ref_bytes(REF_ONT_TTL)


def test_data_byte_identical():
    ours = serialize_turtle_pretty(sorted(_golden_data_triples()))
    assert ours == _ref_bytes(REF_TTL)


def test_spark_pipeline_writes_reference_bytes(spark, tmp_path):
    """End-to-end: reference CSV → Spark triples → pretty sink == the
    reference's own checked-in file, byte for byte."""
    out = str(tmp_path / "data.ttl")
    n = write_turtle_pretty(build_triples(read_fact_csv(spark, REF_CSV)), out)
    assert _ref_bytes(out) == _ref_bytes(REF_TTL)
    assert n == len(_golden_data_triples())


def test_pretty_roundtrips_through_reader(tmp_path):
    triples = _golden_data_triples() | golden.ontology_triples()
    path = str(tmp_path / "all.ttl")
    with open(path, "w", encoding="utf-8") as f:
        f.write(serialize_turtle_pretty(sorted(triples)))
    assert golden.read_turtle(path) == triples


def test_unused_prefixes_dropped_and_a_does_not_count():
    # one plain rdf:type triple: `a` shorthand must NOT emit @prefix rdf:
    rows = [(BASE + "X", RDF_TYPE, RDFS_CLASS, KIND_URI, None, None)]
    text = serialize_turtle_pretty(rows)
    assert "@prefix hc:" in text and "@prefix rdfs:" in text
    assert "@prefix rdf:" not in text and "@prefix xsd:" not in text
    assert "hc:X a rdfs:Class .\n" in text


def test_digit_start_local_falls_back_to_absolute_iri():
    rows = [(BASE + "123abc", RDF_TYPE, RDFS_CLASS, KIND_URI, None, None)]
    text = serialize_turtle_pretty(rows)
    assert "<" + BASE + "123abc> a rdfs:Class .\n" in text
    assert "@prefix hc:" not in text  # hc never actually emitted


def test_plain_integer_and_typed_int_literals():
    rows = [
        (BASE + "n", BASE + "p", "42", KIND_LITERAL, XSD_NS + "integer", None),
        (BASE + "n", BASE + "q", "42", KIND_LITERAL, XSD_NS + "int", None),
    ]
    text = serialize_turtle_pretty(rows)
    assert "hc:p 42 ;\n" in text  # canonical xsd:integer → bare
    assert 'hc:q "42"^^xsd:int' in text  # xsd:int stays typed
