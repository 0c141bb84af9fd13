"""Shared vocabulary: namespaces, predicate URIs, class URIs.

Mirrors the reference ontology (``/root/reference/scripts/build_rdf.py:47-109``,
``/root/reference/data/rdf/healthcare_ontology.ttl``) so emitted triples are
set-comparable with the reference's golden Turtle output.
"""

from __future__ import annotations

BASE = "http://example.org/healthcare#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

RDF_TYPE = RDF_NS + "type"
RDF_PROPERTY = RDF_NS + "Property"
RDFS_CLASS = RDFS_NS + "Class"
RDFS_LABEL = RDFS_NS + "label"
RDFS_COMMENT = RDFS_NS + "comment"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"

XSD_STRING = XSD_NS + "string"
XSD_INT = XSD_NS + "int"

# Classes
CLS_PROVIDER = BASE + "HealthcareProvider"
CLS_PATIENT = BASE + "Patient"
CLS_SPECIALIZATION = BASE + "Specialization"
CLS_LOCATION = BASE + "Location"

KIND_TO_CLASS = {
    "Provider": CLS_PROVIDER,
    "Patient": CLS_PATIENT,
    "Specialization": CLS_SPECIALIZATION,
    "Location": CLS_LOCATION,
}

# Object properties
P_TREATS = BASE + "TREATS"
P_SPECIALIZES_IN = BASE + "SPECIALIZES_IN"
P_LOCATED_AT = BASE + "LOCATED_AT"

# Datatype properties
P_NAME = BASE + "name"
P_BIO = BASE + "bio"
P_AGE = BASE + "age"
P_GENDER = BASE + "gender"
P_CONDITION = BASE + "condition"

# obj_kind markers for the triples DataFrame
KIND_URI = "uri"
KIND_LITERAL = "literal"

# Fact-row column names (the reference's tabular fixture schema,
# /root/reference/data/healthcare.csv:1)
FACT_COLUMNS = [
    "Provider",
    "Patient",
    "Specialization",
    "Location",
    "Bio",
    "Patient_Age",
    "Patient_Gender",
    "Patient_Condition",
]

TRIPLE_COLUMNS = ["subj", "pred", "obj", "obj_kind", "obj_dtype", "obj_lang"]
