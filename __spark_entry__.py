"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship relational→KG triple materialization
on sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 (registry: kgspark/entrypoints.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kgspark import entrypoints  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: KG triple materialization over sf0.001."""
    return entrypoints.QUERIES["kg_triples_geo"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(entrypoints.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names)."""
    return dict(entrypoints.ORACLES)
