"""Document → fact-row extraction (SURVEY.md §2 H1 ◆).

The reference turns each document into (nodes, relationships) with one
LLM call per document (kg_rag/utils/graph_utils.py:100-113). Here the
extractor is a deterministic pure-Python kernel — sentence segmentation
plus dependency-pattern-style regexes over the fact-sentence grammar —
executed executor-side in Arrow batches via ``mapInPandas``. The same
kernel runs single-process in tests (fidelity by construction).

Kernel output per page: ordered fact rows in the reference's tabular
schema (FACT_COLUMNS) with the sentence index; a trailing bio sentence
attaches to the immediately-preceding fact row when its provider
mention matches (spec'd deterministic behavior).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from kgspark.constants import FACT_COLUMNS
from kgspark.extract.html import extract_text

NAME = r"Dr\.(?:\s[A-Z][\w.'-]*)+"
FACT_RE = re.compile(
    rf"^(?P<prov>{NAME}), an? (?P<specs>[A-Za-z ]+?) specialist based in "
    r"(?P<locs>[A-Za-z ]+?), treats (?P<pat>[A-Z][\w'-]*(?: [A-Z][\w'-]*)*) "
    r"\(age (?P<age>\d+), (?P<gender>[A-Za-z]+), (?P<conds>[^)]+)\)\.$"
)
BIO_RE = re.compile(rf"^(?P<prov>{NAME}) is a physician focused on .+\.$")
_AND_SPLIT = re.compile(r"\s+and\s+")


def _multi_join(raw: str) -> str:
    return "|".join(p.strip() for p in _AND_SPLIT.split(raw) if p.strip())


def extract_fact_rows(text: str) -> list[dict]:
    """Pure extraction kernel: page text → ordered fact rows."""
    rows: list[dict] = []
    for sent_idx, line in enumerate(text.split("\n")):
        line = line.strip()
        m = FACT_RE.match(line)
        if m:
            rows.append(
                {
                    "sent_idx": sent_idx,
                    "Provider": m["prov"],
                    "Patient": m["pat"],
                    "Specialization": _multi_join(m["specs"]),
                    "Location": _multi_join(m["locs"]),
                    "Bio": "",
                    "Patient_Age": m["age"],
                    "Patient_Gender": m["gender"],
                    "Patient_Condition": _multi_join(m["conds"]),
                }
            )
            continue
        b = BIO_RE.match(line)
        if b and rows and rows[-1]["Provider"] == b["prov"] and not rows[-1]["Bio"]:
            rows[-1]["Bio"] = line
    return rows


EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, sent_idx int, "
    + ", ".join(f"{c} string" for c in FACT_COLUMNS)
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in ["url", "warc_ts", "sent_idx", *FACT_COLUMNS]}
        for url, warc_ts, html, text, lang in zip(
            pdf["url"], pdf["warc_ts"], pdf["html"], pdf["text"], pdf["lang"]
        ):
            if lang != "en":
                continue
            page_text = text if isinstance(text, str) and text else extract_text(html)
            for row in extract_fact_rows(page_text):
                out["url"].append(url)
                out["warc_ts"].append(warc_ts)
                out["sent_idx"].append(row["sent_idx"])
                for c in FACT_COLUMNS:
                    out[c].append(row[c])
        yield pd.DataFrame(out)


def extract_facts(webpages):
    """webpages(url, warc_ts, html, text, lang) → fact rows DataFrame.

    Arrow-batched ``mapInPandas``; the html column is pruned from the
    scan for rows that carry pre-extracted text only at the batch level
    (Spark must ship both columns), so at 100 TB prefer storing text
    separately once extracted — that is what the pipeline's stage-1
    checkpoint does.
    """
    return webpages.mapInPandas(_extract_batches, schema=EXTRACT_SCHEMA)
