"""Driver-contract invariants for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entry_mod


# non-SQL-expressible ops: pinned exactly by pytest instead of DuckDB.
# Empty since round 4 (kg_pipeline_triples gained a parquet-fixture
# oracle) — every registered query is value-checked by the driver.
ROWS_ONLY: set[str] = set()


def test_every_query_has_an_oracle_or_is_declared_rows_only():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == ROWS_ONLY


def test_entry_runs_on_sf0001(spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["subj", "pred", "obj", "obj_kind", "obj_dtype", "obj_lang"]
    assert df.count() > 0


def test_queries_run_on_vanilla_session(spark):
    """A few representative queries must not depend on kgspark session conf."""
    qs = entry_mod.queries()
    for name in ["slugify_uri", "connected_components", "minhash_lsh_pairs"]:
        assert qs[name](spark, "/root/testdata/sf0.001").count() > 0
