"""Deterministic, engine-portable hashing primitives.

Dedup/LSH operators must be verifiable against the DuckDB oracle, so
all hashing is built on md5 hex — identical across Spark, DuckDB and
Python — rather than engine-private hash functions (Spark's xxhash64 /
DuckDB's hash() disagree).

    h32(s)      = int(md5(s)[:8], 16)           — 32-bit token hash
    hseed(j, s) = h32(str(j) + '|' + s)         — j-th hash family member

These stay native Column expressions (md5/substring/conv are JVM
intrinsics), so the hot path is whole-stage codegen'd, no Python.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

from kgspark.operators.fulltext import TOKEN_SPLIT


def h32_col(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("long")


def hseed_col(seed: int, col: Column) -> Column:
    return h32_col(F.concat(F.lit(f"{seed}|"), col))


def hword_col(j: int, col: Column) -> Column:
    """j-th member of the hash family, 4 members per md5 digest:
    member j uses word (j%4) of md5(f"{j//4}|" + s). One digest serves
    four hashes — 4x fewer md5 evaluations in k-minhash aggregations."""
    block, word = divmod(j, 4)
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{block}|"), col)), 1 + 8 * word, 8), 16, 10
    ).cast("long")


def h32_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def hseed_py(seed: int, s: str) -> int:
    return h32_py(f"{seed}|{s}")


# --- DuckDB SQL fragments (the oracle mirror of the above) -----------------

def h32_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def hseed_sql(seed: int, expr: str) -> str:
    return h32_sql(f"'{seed}|' || {expr}")


def hword_sql(j: int, expr: str) -> str:
    block, word = divmod(j, 4)
    return f"('0x' || substr(md5('{block}|' || {expr}), {1 + 8 * word}, 8))::BIGINT"


def tokens_sql(expr: str) -> str:
    """DuckDB mirror of kgspark.operators.fulltext.tokenize_col."""
    return (
        f"list_filter(string_split_regex(lower({expr}), '{TOKEN_SPLIT}'), t -> t != '')"
    )
