"""Document → fact-row extraction (SURVEY.md §2 H1 ◆).

The reference turns each document into (nodes, relationships) with one
LLM call per document (kg_rag/utils/graph_utils.py:100-113). Here the
extraction grammar is a deterministic pure-Python kernel (the spec,
used by tests and the golden oracle), and the distributed hot path is
NATIVE: the only Python executor-side is the byte-identity html→text
decode (decode-only ``mapInArrow``); line gating, fact parsing, and the
bio-attach all run as codegen'd Column ops + one per-page window
(``_extract_lines_jvm``), with jvm==arrow parity pinned in
tests/test_extract.py.

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


_DECODE_SCHEMA = "url string, warc_ts timestamp, text string"


def _decode_html_batches(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
    """Decode-only Arrow kernel: (url, warc_ts, html) → (url, warc_ts,
    text) via the pure byte-identity extractor. Payloads stay in Arrow
    buffers; rows decode one at a time; NO parsing happens here (the
    JVM line parser handles that for both text and html rows)."""
    import pyarrow as pa

    for rb in batches:
        cols = {name: rb.column(i) for i, name in enumerate(rb.schema.names)}
        html_col = cols["html"]
        # html is a nullable column: a NULL payload is an empty page,
        # not a job-killing TypeError
        texts = [
            extract_text(h) if (h := html_col[i].as_py()) is not None else ""
            for i in range(rb.num_rows)
        ]
        yield pa.RecordBatch.from_pydict(
            {
                "url": cols["url"],
                "warc_ts": cols["warc_ts"],
                "text": pa.array(texts, pa.string()),
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
            payload = html_col[i].as_py()
            if payload is None:
                continue
            page_text = extract_text(payload)
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
            ts = tss[i]
            # page identity is (url, warc_ts): a recrawled url is a NEW
            # page and must not inherit the previous snapshot's pending
            # fact row
            if pending is not None and (pending[0], pending[1]) != (url, ts):
                emit(out, pending)
                pending = None
            line = lines[i].strip()
            m = FACT_RE.match(line)
            if m:
                if pending is not None:
                    emit(out, pending)
                pending = (
                    url,
                    ts,
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
                and (pending[0], pending[1]) == (url, ts)
                and pending[2]["Provider"] == b["prov"]
                and not pending[2]["Bio"]
            ):
                pending[2]["Bio"] = line
        yield _buf_to_batch(out)
    if pending is not None:
        tail = _out_buf()
        emit(tail, pending)
        yield _buf_to_batch(tail)


# ---------------------------------------------------------------------------
# JVM mirror of the line kernel (zero per-row Python on the text path)
# ---------------------------------------------------------------------------
#
# Java regex translation of FACT_RE/BIO_RE, kept byte-parity with the
# CPython kernel (the spec; tests/test_extract.py asserts equality):
# - (?P<name>) → plain numbered groups ((?P< is a Python-only syntax);
# - \s → an explicit class enumerating CPython's str.isspace() set
#   (Java's (?U)\s is the Unicode White_Space property, which EXCLUDES
#   the 0x1c-0x1f separators Python accepts);
# - everything else in the grammar is ASCII classes with identical
#   semantics in both engines.

def _java_ws_class() -> str:
    from kgspark.functions.textfns import _PY_WS

    return "[" + "".join(
        f"\\x{ord(c):02x}" if ord(c) < 256 else f"\\u{ord(c):04x}" for c in _PY_WS
    ) + "]"


def _java_patterns() -> tuple[str, str, str]:
    ws = _java_ws_class()
    name = rf"Dr\.(?:{ws}[A-Z][\w.'-]*)+"
    # (?U): UNICODE_CHARACTER_CLASS, so Java's \w/\d track CPython's
    # Unicode-aware classes (default Java \w is ASCII-only)
    # (?d): UNIX_LINES, so Java's `.` excludes ONLY \n like CPython's
    # (Java default also excludes U+2028/U+2029/U+0085, which survive
    # mid-line since pages split on \n alone — without it a bio line
    # containing U+2028 matched in Python but not on the JVM)
    fact = (
        rf"(?Ud)^({name}), an? ([A-Za-z ]+?) specialist based in "
        r"([A-Za-z ]+?), treats ([A-Z][\w'-]*(?: [A-Z][\w'-]*)*) "
        r"\(age (\d+), ([A-Za-z]+), ([^)]+)\)\.$"
    )
    bio = rf"(?Ud)^({name}) is a physician focused on .+\.$"
    and_split = rf"{ws}+and{ws}+"
    return fact, bio, and_split


def extract_text_col(html_col):
    """JVM mirror of ``kgspark.extract.html.extract_text`` (the pure
    byte-identity spec): same passes, same order, Python whitespace
    semantics via the enumerated class. Parity with the Python kernel
    is asserted in tests/test_extract.py over the datagen corpus; the
    one documented divergence is malformed UTF-8 (Java's decoder may
    emit fewer U+FFFD replacements than CPython's per-byte policy).
    """
    from pyspark.sql import functions as F

    from kgspark.functions.textfns import py_strip_col

    ws = _java_ws_class()
    s = html_col.cast("string")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", "")
    s = F.regexp_replace(
        s,
        rf"(?si)<(script|style|nav|header|footer)\b[^>]*>.*?</\1{ws}*>",
        " ",
    )
    s = F.regexp_replace(
        s,
        rf"(?i)</(p|div|h[1-6]|li|ul|ol|table|tr|br|section|article|blockquote|title){ws}*>"
        rf"|<br{ws}*/?>",
        "\n",
    )
    s = F.regexp_replace(s, r"<[^>]*>", " ")
    for ent, ch in [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")]:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    lines = F.transform(
        F.split(s, "\n"),
        lambda ln: py_strip_col(F.regexp_replace(ln, r"[ \t\r\f\v]+", " ")),
    )
    return F.array_join(F.filter(lines, lambda ln: ln != F.lit("")), "\n")


def _multi_join_col(col):
    """JVM twin of _multi_join: split on \\s+and\\s+, strip, drop empties."""
    from pyspark.sql import functions as F

    from kgspark.functions.textfns import py_strip_col

    _, _, and_split = _java_patterns()
    return F.array_join(
        F.filter(
            F.transform(F.split(col, and_split), lambda p: py_strip_col(p)),
            lambda p: p != F.lit(""),
        ),
        "|",
    )


def _extract_lines_jvm(lines):
    """(url, warc_ts, sent_idx, line) candidate lines → fact rows, all
    native Column ops (regexp gate + group extracts + one per-page
    window for the bio-attach). Exactly ``_extract_line_batches``'
    semantics: a bio attaches to the page's most recent PRECEDING fact
    row iff the provider matches and no earlier bio already attached.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from kgspark.functions.textfns import py_strip_col

    fact_re, bio_re, _ = _java_patterns()
    stripped = lines.withColumn("line", py_strip_col(F.col("line")))

    # Heavy-regex economy: both patterns are ^Dr\.-anchored, so cheap
    # codegen'd string gates (startswith + a distinctive infix) keep the
    # expensive backtracking patterns off noise lines entirely; matching
    # fact lines then run the pattern ONCE — regexp_replace rewrites the
    # line to its 7 groups joined on \x01 and a split recovers them
    # (7 regexp_extract calls would re-execute the pattern per field).
    # The arity guard falls back to per-group extraction in the only
    # corner where \x01 could shift fields (a literal \x01 inside the
    # free-text condition group) — exactness preserved for any input.
    starts = F.col("line").startswith("Dr.")
    is_fact = (
        starts & F.col("line").contains(", treats ") & F.col("line").rlike(fact_re)
    )
    is_bio = (
        starts
        & F.col("line").contains(" is a physician focused on ")
        & F.col("line").rlike(bio_re)
    )
    sep = "\x01"
    packed = F.split(
        F.regexp_replace("line", fact_re, sep.join(f"${g}" for g in range(1, 8))),
        sep,
    )

    # ONE candidate stream, parsed once, then an explicit url exchange:
    # every consumer below (fact rows, bio rows, the window, the final
    # attach join) branches AFTER this exchange, so Spark's exchange
    # reuse evaluates the expensive upstream (html decode + line explode
    # + pattern match) exactly once — without it, each branch re-ran the
    # whole scan (measured 2-3× extraction cost). The shuffle itself is
    # tiny: only MATCHED lines travel (a handful per page — O(facts),
    # not O(corpus)).
    cand = (
        stripped.filter(is_fact | is_bio)
        .select(
            "url",
            "warc_ts",
            "sent_idx",
            "line",
            is_fact.alias("is_fact"),
            F.when(is_fact, packed).alias("packed"),
            F.when(
                is_fact,
                F.when(F.size(packed) == 7, F.element_at(packed, 1)).otherwise(
                    F.regexp_extract("line", fact_re, 1)
                ),
            ).alias("prov"),
            F.when(is_bio, F.regexp_extract("line", bio_re, 1)).alias("bio_prov"),
        )
        .repartition("url", "warc_ts")
    )

    w = Window.partitionBy("url", "warc_ts").orderBy("sent_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    after = cand.withColumn(
        "prev_fact_idx",
        F.last(F.when(F.col("is_fact"), F.col("sent_idx")), ignorenulls=True).over(w),
    ).withColumn(
        "prev_fact_prov",
        F.last(F.when(F.col("is_fact"), F.col("prov")), ignorenulls=True).over(w),
    )

    def grp(i: int):
        return F.when(
            F.size("packed") == 7, F.element_at("packed", i)
        ).otherwise(F.regexp_extract("line", fact_re, i))

    facts = after.filter("is_fact").select(
        "url",
        "warc_ts",
        "sent_idx",
        F.col("prov").alias("Provider"),
        _multi_join_col(grp(2)).alias("Specialization"),
        _multi_join_col(grp(3)).alias("Location"),
        grp(4).alias("Patient"),
        grp(5).alias("Patient_Age"),
        grp(6).alias("Patient_Gender"),
        _multi_join_col(grp(7)).alias("Patient_Condition"),
    )
    attach = (
        after.filter(
            (~F.col("is_fact"))
            & F.col("prev_fact_idx").isNotNull()
            & (F.col("prev_fact_prov") == F.col("bio_prov"))
        )
        # first matching bio per fact row wins
        .groupBy("url", "warc_ts", F.col("prev_fact_idx").alias("sent_idx"))
        .agg(F.min(F.struct(F.col("sent_idx").alias("idx"), F.col("line"))).alias("b"))
        .select(
            "url", "warc_ts", F.col("sent_idx"), F.col("b.line").alias("bio_attached")
        )
    )
    out = facts.join(attach, ["url", "warc_ts", "sent_idx"], "left").select(
        "url",
        "warc_ts",
        "sent_idx",
        "Provider",
        "Patient",
        "Specialization",
        "Location",
        F.coalesce("bio_attached", F.lit("")).alias("Bio"),
        "Patient_Age",
        "Patient_Gender",
        "Patient_Condition",
    )
    # EXTRACT_SCHEMA column order
    return out.select("url", "warc_ts", "sent_idx", *FACT_COLUMNS)


def extract_facts(webpages, text_impl: str | None = None):
    """webpages(url, warc_ts, html, text, lang) → fact rows DataFrame.

    Scale design — the hot (pre-extracted text) path is 100% JVM:

    - the language gate runs JVM-side (pushed into the parquet scan —
      non-English rows never reach the extractor);
    - rows with ``text`` are line-exploded JVM-side, gated with a
      codegen'd contains('Dr.'), then parsed entirely with native
      regexp gates/extracts + one per-page window for the bio-attach
      (``_extract_lines_jvm``) — zero per-row Python; the Arrow batch
      kernel remains available (``text_impl="arrow"`` /
      KGSPARK_EXTRACT_IMPL) as the parity twin of the pure kernel;
    - only rows WITHOUT text ship their html payload, into a dedicated
      mapInArrow that decodes per row inside the Arrow buffer
      (mapInPandas would materialize every payload as Python bytes up
      front) — the byte-identity extractor seam.
    """
    import os

    from pyspark.sql import functions as F

    impl = text_impl or os.environ.get("KGSPARK_EXTRACT_IMPL", "jvm")
    en = webpages.filter(F.col("lang") == "en")
    has_text = F.col("text").isNotNull() & (F.col("text") != "")

    if impl == "jvm":
        # Hybrid: the ONLY Python is the byte-identity html→text decode
        # (the spec function itself, decode-only, Arrow-batched); every
        # line of parsing — explode, gates, regex extraction, bio-attach
        # — is native Columns. (A full-JVM html mirror exists as
        # extract_text_col, but Java regex over whole pages measured
        # slower than the CPython spec kernel; the decode seam stays the
        # honest Python boundary.)
        text_rows = en.filter(has_text).select("url", "warc_ts", "text")
        html_text = (
            en.filter(~has_text)
            .select("url", "warc_ts", "html")
            .mapInArrow(_decode_html_batches, schema=_DECODE_SCHEMA)
        )
        pages = text_rows.unionByName(html_text)
        lines = (
            pages.select(
                "url",
                "warc_ts",
                F.posexplode(F.split(F.col("text"), "\n")).alias("sent_idx", "line"),
            )
            .filter(F.col("line").contains("Dr."))
        )
        return _extract_lines_jvm(lines)

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
