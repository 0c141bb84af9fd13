"""Debug Turtle writer (SURVEY.md A2 — non-goal for fidelity, handy for
eyeballing small graphs; the engine's real sink is Parquet+manifests).

Writes N-Triples-flavored Turtle: one triple per line, absolute IRIs,
sorted for determinism. ``kgspark.golden.read_turtle`` round-trips it.
Driver-side by design — debugging tool for small outputs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kgspark.constants import KIND_URI

_LIT_ESCAPES = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def _escape(s: str) -> str:
    return "".join(_LIT_ESCAPES.get(ch, ch) for ch in s)


def triple_to_turtle_line(subj, pred, obj, obj_kind, obj_dtype, obj_lang) -> str:
    if obj_kind == KIND_URI:
        o = f"<{obj}>"
    else:
        o = f'"{_escape(obj)}"'
        if obj_dtype:
            o += f"^^<{obj_dtype}>"
        elif obj_lang:
            o += f"@{obj_lang}"
    return f"<{subj}> <{pred}> {o} ."


def write_turtle(triples: DataFrame, path: str, max_rows: int = 1_000_000) -> int:
    """Collect (bounded), sort, write one .ttl file. Returns row count.

    Truncation over ``max_rows`` keeps the lexicographically-first
    triples: a bare limit() would take an arbitrary partition-dependent
    subset, making two writes of the same graph diverge. Debug sink —
    a real export writes distributed, not through the driver.
    """
    cols = ["subj", "pred", "obj", "obj_kind", "obj_dtype", "obj_lang"]
    rows = triples.orderBy(*cols).limit(max_rows).collect()
    lines = sorted(
        triple_to_turtle_line(r.subj, r.pred, r.obj, r.obj_kind, r.obj_dtype, r.obj_lang)
        for r in rows
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    return len(lines)
