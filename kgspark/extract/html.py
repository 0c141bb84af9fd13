"""Deterministic HTML→text boilerplate-stripping extractor.

This single pure function IS the per-row invariant of BASELINE.json:
the distributed path (extract/ner.py mapInPandas batches) imports and
calls exactly this function, so "byte-identical extracted text per url
vs the single-process reference extractor" holds by construction and is
asserted in tests/test_extract.py.

Spec (trafilatura-style, self-defined since trafilatura is not in the
sandbox; analog of the reference's LLM-ingested page text,
kg_rag/utils/graph_utils.py:100-113):
1. decode UTF-8 (errors=replace);
2. drop <script>/<style>/<nav>/<header>/<footer> elements with content;
3. drop comments; break block-level closings into newlines;
4. strip remaining tags; unescape the five XML entities;
5. collapse horizontal whitespace, trim lines, drop empties, join '\n'.
"""

from __future__ import annotations

import re

_DROP_ELEMENTS = re.compile(
    # '\Z' alternative: an UNCLOSED script/style/nav/... swallows to end
    # of document instead of leaking its raw contents (JS/CSS) into the
    # extracted text; same-tag nesting stays best-effort (regex, not a
    # parser — stray close tags are removed by the generic tag strip)
    r"<(script|style|nav|header|footer)\b[^>]*>.*?(?:</\1\s*>|\Z)",
    re.IGNORECASE | re.DOTALL,
)
_COMMENTS = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_CLOSE = re.compile(
    r"</(p|div|h[1-6]|li|ul|ol|table|tr|br|section|article|blockquote|title)\s*>"
    r"|<br\s*/?>",
    re.IGNORECASE,
)
_TAGS = re.compile(r"<[^>]*>")
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]
_HSPACE = re.compile(r"[ \t\r\f\v]+")


def extract_text(html: bytes | str) -> str:
    """The canonical page-text extraction (pure, total, deterministic)."""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _COMMENTS.sub("", s)
    s = _DROP_ELEMENTS.sub(" ", s)
    s = _BLOCK_CLOSE.sub("\n", s)
    s = _TAGS.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    lines = []
    for line in s.split("\n"):
        line = _HSPACE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
