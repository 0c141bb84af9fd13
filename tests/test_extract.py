"""Extraction invariants: byte-identical text per url + kernel recall."""

from __future__ import annotations

from kgspark import datagen
from kgspark.extract.html import extract_text
from kgspark.extract.ner import extract_fact_rows


def test_extract_text_strips_boilerplate():
    html = b"""<html><head><script>evil()</script><style>a{}</style></head>
    <body><nav>menu</nav><header><h1>T</h1></header>
    <p>Keep me.</p><p>And  me &amp; co.</p>
    <!-- comment --><footer>legal</footer></body></html>"""
    assert extract_text(html) == "Keep me.\nAnd me & co."


def test_extract_text_byte_identity_over_corpus():
    corpus = datagen.generate_corpus(n_pages=60, seed=7)
    for url, _, html, text, _ in corpus.pages:
        extracted = extract_text(html)
        assert extracted == corpus.page_texts[url]
        if text is not None:  # pre-extracted column carries the same bytes
            assert text == extracted


def test_fact_kernel_roundtrip():
    """Every generated fact row is recovered verbatim (modulo linking)."""
    corpus = datagen.generate_corpus(n_pages=80, seed=11)
    alias_map = dict(corpus.aliases)
    recovered = []
    for url, _, html, _, lang in corpus.pages:
        if lang != "en":
            continue
        for row in extract_fact_rows(extract_text(html)):
            row = dict(row)
            row.pop("sent_idx")
            row["Provider"] = alias_map.get(row["Provider"], row["Provider"])
            recovered.append(row)
    expected = [dict(r) for r in corpus.fact_rows]
    assert recovered == expected


def test_fact_kernel_ignores_noise():
    text = "Random line.\nDr. Foo Bar is a physician focused on nothing much.\n"
    assert extract_fact_rows(text) == []
