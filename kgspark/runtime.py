"""Execution-boundary helpers shared by the operator modules.

``materialize`` is the one knob for the eager ``localCheckpoint`` calls
operators place at reuse boundaries (a subtree with 2+ consumers, or a
self-join over an expensive signature table). Materializing there is
the right default for batch jobs — it evaluates the subtree once
instead of per consumer — but it pins executor storage for the life of
the session and makes the frame non-recomputable on executor loss
(localCheckpoint blocks are unrecoverable), which long-lived library
sessions may not want. Those callers set ``KGSPARK_MATERIALIZE=0`` (or
pass ``materialize=False`` where an operator exposes the flag) and take
the recompute instead; production pipelines write a real table at these
boundaries (plans/pipeline.py), which needs neither.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def materialize_enabled() -> bool:
    return os.environ.get("KGSPARK_MATERIALIZE", "1") != "0"


def materialize(df: DataFrame, enabled: bool | None = None) -> DataFrame:
    """Eagerly localCheckpoint ``df`` at a reuse boundary (see module
    docstring); identity when disabled."""
    if enabled is None:
        enabled = materialize_enabled()
    return df.localCheckpoint(eager=True) if enabled else df
