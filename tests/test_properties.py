"""Property-based tests (hypothesis) for the pure-Python golden kernels."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from kgspark import golden
from kgspark.sources.turtle_sink import triple_to_turtle_line

text_strategy = st.text(max_size=60)


@given(text_strategy)
@settings(max_examples=300)
def test_slugify_invariants(s):
    slug = golden.slugify(s)
    assert slug  # never empty
    assert re.fullmatch(r"\w+", slug)  # only word chars
    assert "__" not in slug and not slug.startswith("_") and not slug.endswith("_")
    assert golden.slugify(slug) == slug  # idempotent


@given(text_strategy)
@settings(max_examples=300)
def test_split_multi_invariants(s):
    parts = golden.split_multi(s)
    for p in parts:
        assert p == p.strip() and p != ""
        assert not re.search(r"[|;,]", p)
    # reassembling with any separator re-splits to the same parts
    if parts:
        assert golden.split_multi("|".join(parts)) == parts


@given(
    st.text(max_size=40),
    st.sampled_from(["literal", "uri"]),
    st.one_of(st.none(), st.just("http://www.w3.org/2001/XMLSchema#int")),
)
@settings(max_examples=200)
def test_turtle_line_roundtrip(obj, kind, dtype):
    """write_turtle's line format parses back to the identical triple."""
    if kind == "uri":
        obj = "http://example.org/x#" + golden.slugify(obj)
        dtype = None
    line = triple_to_turtle_line(
        "http://example.org/x#S", "http://example.org/x#p", obj, kind, dtype, None
    )
    parsed = golden.read_turtle.__wrapped__ if hasattr(golden.read_turtle, "__wrapped__") else None
    # parse via a temp file API-compatible path
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".ttl", delete=False, encoding="utf-8") as f:
        f.write(line + "\n")
        path = f.name
    triples = golden.read_turtle(path)
    assert triples == {
        ("http://example.org/x#S", "http://example.org/x#p", obj, kind, dtype, None)
    }


def test_age_literal_matches_python_int():
    cases = ["42", "066", "-3", "+7", "1_0", "not a number", "4.5", " 9", "٣"]
    for raw in cases:
        lex, dtype = golden.parse_age_literal(raw)
        try:
            expected = str(int(raw))
            assert (lex, dtype) == (expected, golden.XSD_INT)
        except ValueError:
            assert (lex, dtype) == (raw, None)
