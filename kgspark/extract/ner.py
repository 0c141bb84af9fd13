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


def _extract_batches(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
    import pyarrow as pa

    for rb in batches:
        cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
        out: dict[str, list] = {k: [] for k in ["url", "warc_ts", "sent_idx", *FACT_COLUMNS]}
        langs = cols["lang"].to_pylist()
        texts = cols["text"].to_pylist()
        urls = cols["url"].to_pylist()
        tss = cols["warc_ts"].to_pylist()
        html_col = cols["html"]  # stays in the Arrow buffer; decoded per row
        for i in range(rb.num_rows):
            if langs[i] != "en":
                continue
            page_text = texts[i] if texts[i] else extract_text(html_col[i].as_py())
            for row in extract_fact_rows(page_text):
                out["url"].append(urls[i])
                out["warc_ts"].append(tss[i])
                out["sent_idx"].append(row["sent_idx"])
                for c in FACT_COLUMNS:
                    out[c].append(row[c])
        yield pa.RecordBatch.from_pydict(
            {
                "url": pa.array(out["url"], pa.string()),
                "warc_ts": pa.array(out["warc_ts"], pa.timestamp("us", tz="UTC")),
                "sent_idx": pa.array(out["sent_idx"], pa.int32()),
                **{c: pa.array(out[c], pa.string()) for c in FACT_COLUMNS},
            }
        )


def extract_facts(webpages):
    """webpages(url, warc_ts, html, text, lang) → fact rows DataFrame.

    ``mapInArrow`` rather than ``mapInPandas``: pandas conversion would
    materialize every html payload as a Python bytes object up front
    (GB-scale allocator churn per worker); with Arrow batches the
    binary column stays in Arrow buffers and is decoded row-by-row
    only when the text fallback actually needs it.

    Rows that already carry pre-extracted ``text`` get their html
    payload nulled JVM-side before Arrow serialization — the
    JVM→Python transfer is the contended resource, and those bytes
    would never be touched.
    """
    from pyspark.sql import functions as F

    pruned = webpages.withColumn(
        "html",
        F.when(
            F.col("text").isNotNull() & (F.col("text") != ""),
            F.lit(None).cast("binary"),
        ).otherwise(F.col("html")),
    )
    return pruned.mapInArrow(_extract_batches, schema=EXTRACT_SCHEMA)
