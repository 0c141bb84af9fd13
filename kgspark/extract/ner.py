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


def _out_buf() -> dict[str, list]:
    return {k: [] for k in ["url", "warc_ts", "sent_idx", *FACT_COLUMNS]}


def _buf_to_batch(out: dict[str, list]) -> "pa.RecordBatch":
    import pyarrow as pa

    return pa.RecordBatch.from_pydict(
        {
            "url": pa.array(out["url"], pa.string()),
            "warc_ts": pa.array(out["warc_ts"], pa.timestamp("us", tz="UTC")),
            "sent_idx": pa.array(out["sent_idx"], pa.int32()),
            **{c: pa.array(out[c], pa.string()) for c in FACT_COLUMNS},
        }
    )


def _extract_html_batches(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
    """html-fallback path: decode + extract_text + full page kernel."""
    for rb in batches:
        cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
        out = _out_buf()
        urls = cols["url"].to_pylist()
        tss = cols["warc_ts"].to_pylist()
        html_col = cols["html"]  # stays in the Arrow buffer; decoded per row
        for i in range(rb.num_rows):
            page_text = extract_text(html_col[i].as_py())
            for row in extract_fact_rows(page_text):
                out["url"].append(urls[i])
                out["warc_ts"].append(tss[i])
                out["sent_idx"].append(row["sent_idx"])
                for c in FACT_COLUMNS:
                    out[c].append(row[c])
        yield _buf_to_batch(out)


def _extract_line_batches(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
    """Pre-extracted-text path over a JVM-filtered LINE stream.

    Input rows are (url, warc_ts, sent_idx, line) — one page's candidate
    lines, contiguous and in sentence order (narrow posexplode, no
    shuffle before this op). Equivalent to running extract_fact_rows on
    the full page text because both FACT_RE and BIO_RE only match lines
    starting with 'Dr.', which the JVM contains('Dr.') gate preserves.

    The page kernel's bio-attach mutates the page's LAST fact row, so
    each page's most recent fact row is held PENDING until the next
    fact row, a url change, or end-of-stream — Arrow batch boundaries
    may split a page, hence the cross-batch carry. Assumes one input
    row per url (the input_hint contract).
    """
    pending: tuple | None = None  # (url, warc_ts, fact-row dict)

    def emit(buf: dict, p: tuple) -> None:
        url, ts, row = p
        buf["url"].append(url)
        buf["warc_ts"].append(ts)
        buf["sent_idx"].append(row["sent_idx"])
        for c in FACT_COLUMNS:
            buf[c].append(row[c])

    for rb in batches:
        cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
        urls = cols["url"].to_pylist()
        tss = cols["warc_ts"].to_pylist()
        idxs = cols["sent_idx"].to_pylist()
        lines = cols["line"].to_pylist()
        out = _out_buf()
        for i in range(rb.num_rows):
            url = urls[i]
            if pending is not None and pending[0] != url:
                emit(out, pending)
                pending = None
            line = lines[i].strip()
            m = FACT_RE.match(line)
            if m:
                if pending is not None:
                    emit(out, pending)
                pending = (
                    url,
                    tss[i],
                    {
                        "sent_idx": idxs[i],
                        "Provider": m["prov"],
                        "Patient": m["pat"],
                        "Specialization": _multi_join(m["specs"]),
                        "Location": _multi_join(m["locs"]),
                        "Bio": "",
                        "Patient_Age": m["age"],
                        "Patient_Gender": m["gender"],
                        "Patient_Condition": _multi_join(m["conds"]),
                    },
                )
                continue
            b = BIO_RE.match(line)
            if (
                b
                and pending is not None
                and pending[0] == url
                and pending[2]["Provider"] == b["prov"]
                and not pending[2]["Bio"]
            ):
                pending[2]["Bio"] = line
        yield _buf_to_batch(out)
    if pending is not None:
        tail = _out_buf()
        emit(tail, pending)
        yield _buf_to_batch(tail)


def extract_facts(webpages):
    """webpages(url, warc_ts, html, text, lang) → fact rows DataFrame.

    Scale design — keep Python work and Arrow transfer proportional to
    CANDIDATE bytes, not corpus bytes:

    - the language gate runs JVM-side (pushed into the parquet scan —
      non-English rows never reach Python);
    - rows with pre-extracted ``text`` are line-exploded JVM-side and
      gated with a codegen'd contains('Dr.') — filler prose (the vast
      majority of web-page bytes) is dropped before serialization, so
      the Python kernel regexes only candidate lines;
    - only rows WITHOUT text ship their html payload, into a dedicated
      mapInArrow that decodes per row inside the Arrow buffer
      (mapInPandas would materialize every payload as Python bytes up
      front).
    """
    from pyspark.sql import functions as F

    en = webpages.filter(F.col("lang") == "en")
    has_text = F.col("text").isNotNull() & (F.col("text") != "")

    lines = (
        en.filter(has_text)
        .select(
            "url",
            "warc_ts",
            F.posexplode(F.split(F.col("text"), "\n")).alias("sent_idx", "line"),
        )
        .filter(F.col("line").contains("Dr."))
    )
    facts_text = lines.mapInArrow(_extract_line_batches, schema=EXTRACT_SCHEMA)

    html_rows = en.filter(~has_text).select("url", "warc_ts", "html")
    facts_html = html_rows.mapInArrow(_extract_html_batches, schema=EXTRACT_SCHEMA)

    return facts_text.unionByName(facts_html)
