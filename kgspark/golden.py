"""Pure-Python, single-process golden oracle.

This module is the *specification* the distributed engine is measured
against (BASELINE.json: triple P/R >= 0.95, byte-identical extracted
text per url). It re-implements, from the published behavior, the
deterministic semantics of the reference's CSV→RDF builder
(``/root/reference/scripts/build_rdf.py:112-205``):

- field trimming and the Provider∧Patient row gate (build_rdf.py:157-167)
- slug-based URI minting under ``http://example.org/healthcare#``
  (build_rdf.py:25-33)
- multi-value splitting on ``[|;,]`` with trimmed, non-empty parts and
  the raw-value fallback (build_rdf.py:35-40,173-179,194-196)
- per-(kind,name) entity memoization, type triples, first-wins ``name``
  keyed by URI (build_rdf.py:121-152)
- first-non-empty-wins ``bio``/``gender``/``age`` keyed by entity URI,
  ``int()`` cast with raw-string fallback for age (build_rdf.py:185-203)
- rdflib set semantics: the output is a *set* of triples.

It also provides a minimal Turtle reader sufficient to load the
reference's checked-in golden files (``data/rdf/healthcare_data.ttl``)
for exact P/R comparison, since rdflib is unavailable in this sandbox.

Everything here is deliberately single-process and dependency-free so
it can double as (a) the pytest ground truth and (b) the per-batch
kernel inside Arrow UDFs where byte-fidelity is required.
"""

from __future__ import annotations

import re
from collections.abc import Iterable, Mapping

from kgspark.constants import (
    BASE,
    FACT_COLUMNS,
    KIND_LITERAL,
    KIND_TO_CLASS,
    KIND_URI,
    P_AGE,
    P_BIO,
    P_CONDITION,
    P_GENDER,
    P_LOCATED_AT,
    P_NAME,
    P_SPECIALIZES_IN,
    P_TREATS,
    RDF_PROPERTY,
    RDF_TYPE,
    RDFS_CLASS,
    RDFS_COMMENT,
    RDFS_DOMAIN,
    RDFS_LABEL,
    RDFS_RANGE,
    XSD_INT,
    XSD_STRING,
    CLS_LOCATION,
    CLS_PATIENT,
    CLS_PROVIDER,
    CLS_SPECIALIZATION,
)

Triple = tuple[str, str, str, str, str | None, str | None]

_WS_RE = re.compile(r"\s+")
_NONWORD_RE = re.compile(r"[^\w]")
_UNDERSCORES_RE = re.compile(r"_+")
_MULTI_SPLIT_RE = re.compile(r"[|;,]")


def slugify(name: str | None) -> str:
    """URI-safe local name; byte-compatible with the reference's slugify."""
    s = _WS_RE.sub("_", (name or "").strip())
    s = _NONWORD_RE.sub("_", s)
    s = _UNDERSCORES_RE.sub("_", s).strip("_")
    return s or "unnamed"


def mint_uri(label: str | None) -> str:
    return BASE + slugify(label)


def split_multi(val: str | None) -> list[str]:
    """Split a multi-valued cell on ``|``/``;``/``,``; trimmed non-empty parts."""
    if not val:
        return []
    return [p.strip() for p in _MULTI_SPLIT_RE.split(val) if p.strip()]


def multi_or_raw(raw: str) -> list[str]:
    """The reference's fallback: if splitting a non-empty cell yields no
    usable parts (e.g. ``",,"``), the raw cell itself is used."""
    if not raw:
        return []
    return split_multi(raw) or [raw]


def parse_age_literal(age_raw: str) -> tuple[str, str | None]:
    """Return (lexical form, datatype) for an age cell: ``int()`` cast with
    raw-string fallback, per build_rdf.py:198-203."""
    try:
        return str(int(age_raw)), XSD_INT
    except ValueError:
        return age_raw, None


def ontology_triples() -> set[Triple]:
    """The static RDFS schema graph (build_rdf.py:47-109) as tuples."""
    out: set[Triple] = set()

    def uri(s: str, p: str, o: str) -> None:
        out.add((s, p, o, KIND_URI, None, None))

    def lit(s: str, p: str, o: str, dtype: str | None = None, lang: str | None = None) -> None:
        out.add((s, p, o, KIND_LITERAL, dtype, lang))

    classes = [
        (CLS_PROVIDER, "Healthcare Provider", "A medical professional who provides healthcare services."),
        (CLS_PATIENT, "Patient", "An individual who receives healthcare services."),
        (CLS_SPECIALIZATION, "Medical Specialization", "A medical specialty, e.g., Pediatrics, Cardiology."),
        (CLS_LOCATION, "Location", "A city or place where providers/patients are located."),
    ]
    for cls, label, comment in classes:
        uri(cls, RDF_TYPE, RDFS_CLASS)
        lit(cls, RDFS_LABEL, label, None, "en")
        lit(cls, RDFS_COMMENT, comment, None, "en")

    obj_props = [
        (P_LOCATED_AT, "located at", CLS_PROVIDER, CLS_LOCATION),
        (P_SPECIALIZES_IN, "specializes in", CLS_PROVIDER, CLS_SPECIALIZATION),
        (P_TREATS, "treats", CLS_PROVIDER, CLS_PATIENT),
    ]
    for prop, label, domain, rng in obj_props:
        uri(prop, RDF_TYPE, RDF_PROPERTY)
        lit(prop, RDFS_LABEL, label, None, "en")
        uri(prop, RDFS_DOMAIN, domain)
        uri(prop, RDFS_RANGE, rng)

    dt_props = [(P_NAME, XSD_STRING), (P_BIO, XSD_STRING), (P_AGE, XSD_INT), (P_GENDER, XSD_STRING), (P_CONDITION, XSD_STRING)]
    for prop, rng in dt_props:
        uri(prop, RDF_TYPE, RDF_PROPERTY)
        uri(prop, RDFS_RANGE, rng)

    uri(P_BIO, RDFS_DOMAIN, CLS_PROVIDER)
    uri(P_AGE, RDFS_DOMAIN, CLS_PATIENT)
    uri(P_GENDER, RDFS_DOMAIN, CLS_PATIENT)
    uri(P_CONDITION, RDFS_DOMAIN, CLS_PATIENT)
    return out


def fact_rows_to_triples(rows: Iterable[Mapping[str, str | None]]) -> set[Triple]:
    """Single-process triple builder over fact rows (the golden path).

    ``rows`` must be in source order — first-wins attributes depend on it.
    Output is the triple *set* (rdflib Graph semantics).
    """
    triples: set[Triple] = set()
    seen_entities: set[tuple[str, str]] = set()
    named_uris: set[str] = set()
    attr_done: dict[str, set[str]] = {"bio": set(), "gender": set(), "age": set()}

    def touch_entity(kind: str, label: str) -> str:
        """First sighting of (kind, trimmed label) emits type + name triples."""
        uri = mint_uri(label)
        key = (kind, label)
        if key in seen_entities:
            return uri
        seen_entities.add(key)
        triples.add((uri, RDF_TYPE, KIND_TO_CLASS[kind], KIND_URI, None, None))
        if label and uri not in named_uris:
            triples.add((uri, P_NAME, label, KIND_LITERAL, None, None))
            named_uris.add(uri)
        return uri

    for row in rows:
        vals = {c: (row.get(c) or "").strip() for c in FACT_COLUMNS}
        if not vals["Provider"] or not vals["Patient"]:
            continue

        prov = touch_entity("Provider", vals["Provider"])
        pat = touch_entity("Patient", vals["Patient"])

        for part in multi_or_raw(vals["Specialization"]):
            spec = touch_entity("Specialization", part)
            triples.add((prov, P_SPECIALIZES_IN, spec, KIND_URI, None, None))

        for part in multi_or_raw(vals["Location"]):
            loc = touch_entity("Location", part)
            triples.add((prov, P_LOCATED_AT, loc, KIND_URI, None, None))

        triples.add((prov, P_TREATS, pat, KIND_URI, None, None))

        if vals["Bio"] and prov not in attr_done["bio"]:
            triples.add((prov, P_BIO, vals["Bio"], KIND_LITERAL, None, None))
            attr_done["bio"].add(prov)

        if vals["Patient_Gender"] and pat not in attr_done["gender"]:
            triples.add((pat, P_GENDER, vals["Patient_Gender"], KIND_LITERAL, None, None))
            attr_done["gender"].add(pat)

        if vals["Patient_Condition"]:
            for part in multi_or_raw(vals["Patient_Condition"]):
                triples.add((pat, P_CONDITION, part, KIND_LITERAL, None, None))

        if vals["Patient_Age"] and pat not in attr_done["age"]:
            lex, dtype = parse_age_literal(vals["Patient_Age"])
            triples.add((pat, P_AGE, lex, KIND_LITERAL, dtype, None))
            attr_done["age"].add(pat)

    return triples


# ---------------------------------------------------------------------------
# Minimal Turtle reader (enough for the reference's golden files)
# ---------------------------------------------------------------------------

_TTL_PREFIX_RE = re.compile(r"@prefix\s+(\w*):\s+<([^>]*)>\s*\.")


def _ttl_tokens(text: str) -> list[str]:
    """Tokenize a Turtle document into IRIs, prefixed names, literals and
    punctuation (``. ; ,``). Handles escaped quotes inside literals."""
    tokens: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in " \t\r\n":
            i += 1
        elif ch == "#":
            # always a comment at a token start (Turtle comments may
            # follow ANY token, not just statement terminators; IRIs
            # with '#' are inside '<>' and never reach this branch)
            while i < n and text[i] != "\n":
                i += 1
        elif ch == "<":
            j = text.index(">", i)
            tokens.append(text[i : j + 1])
            i = j + 1
        elif ch == '"':
            if text[i : i + 3] == '"""':
                j = text.index('"""', i + 3)
                lit = text[i : j + 3]
                i = j + 3
            else:
                j = i + 1
                while text[j] != '"':
                    j += 2 if text[j] == "\\" else 1
                lit = text[i : j + 1]
                i = j + 1
            # attach datatype/lang suffix if present
            if text[i : i + 2] == "^^":
                j = i + 2
                if j < n and text[j] == "<":  # full-IRI datatype (may contain '.')
                    j = text.index(">", j) + 1
                else:
                    while j < n and text[j] not in " \t\r\n;,.":
                        j += 1
                lit += text[i:j]
                i = j
            elif i < n and text[i] == "@":
                j = i + 1
                while j < n and (text[j].isalnum() or text[j] == "-"):
                    j += 1
                lit += text[i:j]
                i = j
            tokens.append(lit)
        elif ch in ".;,":
            tokens.append(ch)
            i += 1
        else:
            j = i
            while j < n and text[j] not in " \t\r\n;,." or (j < n and text[j] == "." and j + 1 < n and text[j + 1] not in " \t\r\n"):
                j += 1
            tokens.append(text[i:j])
            i = j
    return tokens


_TTL_ESCAPES = {"\\n": "\n", "\\t": "\t", "\\r": "\r", '\\"': '"', "\\\\": "\\"}


def _unescape_literal(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        if s[i] == "\\" and i + 1 < len(s):
            pair = s[i : i + 2]
            if pair in _TTL_ESCAPES:
                out.append(_TTL_ESCAPES[pair])
                i += 2
                continue
            if s[i + 1] in "uU":
                width = 4 if s[i + 1] == "u" else 8
                out.append(chr(int(s[i + 2 : i + 2 + width], 16)))
                i += 2 + width
                continue
        out.append(s[i])
        i += 1
    return "".join(out)


def read_turtle(path: str) -> set[Triple]:
    """Load a simple Turtle file into the engine's triple-tuple set."""
    with open(path, encoding="utf-8") as f:
        text = f.read()

    prefixes = dict(_TTL_PREFIX_RE.findall(text))
    body = _TTL_PREFIX_RE.sub("", text)

    def expand(tok: str) -> str:
        if tok.startswith("<"):
            return tok[1:-1]
        if tok == "a":
            return RDF_TYPE
        pfx, _, local = tok.partition(":")
        return prefixes[pfx] + local

    def term(tok: str) -> tuple[str, str, str | None, str | None]:
        if tok.startswith('"'):
            dtype = lang = None
            # Locate the CLOSING quote first; ^^/@ are datatype/lang
            # markers only AFTER it (a body containing '^^' or '@' —
            # e.g. "a^^b" — must not be mis-split).
            if tok.startswith('"""'):
                quote_len = 3
                end = tok.index('"""', 3) + 3
            else:
                quote_len = 1
                j = 1
                while tok[j] != '"':
                    j += 2 if tok[j] == "\\" else 1
                end = j + 1
            suffix = tok[end:]
            if suffix.startswith("^^"):
                dtype = expand(suffix[2:])
            elif suffix.startswith("@"):
                lang = suffix[1:]
            inner = tok[quote_len : end - quote_len]
            return (_unescape_literal(inner), KIND_LITERAL, dtype, lang)
        return (expand(tok), KIND_URI, None, None)

    triples: set[Triple] = set()
    tokens = _ttl_tokens(body)
    i = 0
    while i < len(tokens):
        subj = expand(tokens[i])
        i += 1
        while True:  # predicate list
            pred = expand(tokens[i])
            i += 1
            while True:  # object list
                obj, kind, dtype, lang = term(tokens[i])
                i += 1
                triples.add((subj, pred, obj, kind, dtype, lang))
                if tokens[i] == ",":
                    i += 1
                    continue
                break
            if tokens[i] == ";":
                i += 1
                if tokens[i] == ".":  # trailing ; before .
                    i += 1
                    break
                continue
            if tokens[i] == ".":
                i += 1
                break
        continue
    return triples


def precision_recall(produced: set[Triple], expected: set[Triple]) -> tuple[float, float]:
    if not produced and not expected:
        return (1.0, 1.0)  # empty vs empty is exact agreement
    if not produced or not expected:
        return (0.0, 0.0)
    inter = len(produced & expected)
    return inter / len(produced), inter / len(expected)
