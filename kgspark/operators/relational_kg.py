"""Relational→KG triple materialization over the driver's testdata.

The flagship demonstration of the engine's EP1 path (SURVEY.md §3) on
the sandbox's TPC-H-ish tables: entities are customers, suppliers,
nations and regions; edges are their geographic containment relations.
URI minting / slug / type / name semantics are exactly the engine's
standard ones (operators/rdf_build.py), so this exercises the same
operator stack the healthcare pipeline uses — scan → trim → slug UDF →
triple explode → set dedup — on data where a DuckDB oracle can verify
every value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark.constants import BASE, KIND_LITERAL, KIND_URI, RDF_TYPE, TRIPLE_COLUMNS
from kgspark.functions.textfns import mint_uri_col

P_LOCATED_IN = BASE + "LOCATED_IN"
P_PART_OF = BASE + "PART_OF"
P_NAME_R = BASE + "name"
P_ACCTBAL = BASE + "acctbal"
P_SEGMENT = BASE + "mktsegment"

CLS_CUSTOMER = BASE + "Customer"
CLS_SUPPLIER = BASE + "Supplier"
CLS_NATION = BASE + "Nation"
CLS_REGION = BASE + "Region"


def load_tables(spark: SparkSession, sf_dir: str, names: list[str]) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def _cand(pred: str, obj, kind: str):
    return F.struct(
        F.lit(pred).alias("pred"), obj.alias("obj"), F.lit(kind).alias("obj_kind")
    )


def _explode_cands(df: DataFrame, subj, cands: list) -> DataFrame:
    """One pass per source table: the subject URI (slug pandas UDF) is
    evaluated once per row and every triple candidate rides out through
    a single explode — a union of per-triple selects would re-run the
    Arrow slug batch once per branch (same recompute shape as the LSH
    banding unions, fixed the same way)."""
    return (
        df.select(subj.alias("subj"), F.explode(F.array(*cands)).alias("t"))
        .select(
            "subj",
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj"),
            F.col("t.obj_kind").alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_dtype"),
            F.lit(None).cast("string").alias("obj_lang"),
        )
        # left-join edge targets may be absent; entity/literal objs never are
        .filter(F.col("obj").isNotNull())
    )


def build_geo_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer/supplier/nation/region → deduplicated triples table.

    Join strategy: nation (25 rows) and region (5 rows) broadcast onto
    the big fact tables — no shuffle for edge derivation; the only
    shuffle is the final set-dedup, keyed by the (uniform) triple hash.
    Each source table is scanned once, with all of its triple
    candidates (type, name, literals, containment edge) exploding out
    of a single projection.
    """
    t = load_tables(spark, sf_dir, ["customer", "supplier", "nation", "region"])
    nation = F.broadcast(t["nation"])
    region = F.broadcast(t["region"])

    cust = t["customer"].join(
        nation, t["customer"].c_nationkey == nation.n_nationkey, "left"
    )
    supp = t["supplier"].join(
        nation, t["supplier"].s_nationkey == nation.n_nationkey, "left"
    )
    nat = t["nation"].join(
        region, t["nation"].n_regionkey == region.r_regionkey, "left"
    )

    parts = [
        _explode_cands(
            cust,
            mint_uri_col(F.trim(F.col("c_name"))),
            [
                _cand(RDF_TYPE, F.lit(CLS_CUSTOMER), KIND_URI),
                _cand(P_NAME_R, F.trim(F.col("c_name")), KIND_LITERAL),
                _cand(P_ACCTBAL, F.format_string("%.2f", F.col("c_acctbal")), KIND_LITERAL),
                _cand(P_SEGMENT, F.col("c_mktsegment"), KIND_LITERAL),
                _cand(P_LOCATED_IN, mint_uri_col(F.trim(F.col("n_name"))), KIND_URI),
            ],
        ),
        _explode_cands(
            supp,
            mint_uri_col(F.trim(F.col("s_name"))),
            [
                _cand(RDF_TYPE, F.lit(CLS_SUPPLIER), KIND_URI),
                _cand(P_NAME_R, F.trim(F.col("s_name")), KIND_LITERAL),
                _cand(P_LOCATED_IN, mint_uri_col(F.trim(F.col("n_name"))), KIND_URI),
            ],
        ),
        _explode_cands(
            nat,
            mint_uri_col(F.trim(F.col("n_name"))),
            [
                _cand(RDF_TYPE, F.lit(CLS_NATION), KIND_URI),
                _cand(P_NAME_R, F.trim(F.col("n_name")), KIND_LITERAL),
                _cand(P_PART_OF, mint_uri_col(F.trim(F.col("r_name"))), KIND_URI),
            ],
        ),
        _explode_cands(
            t["region"],
            mint_uri_col(F.trim(F.col("r_name"))),
            [
                _cand(RDF_TYPE, F.lit(CLS_REGION), KIND_URI),
                _cand(P_NAME_R, F.trim(F.col("r_name")), KIND_LITERAL),
            ],
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(TRIPLE_COLUMNS)


def geo_edges(spark: SparkSession, sf_dir: str, entity_prefixes: bool = True) -> DataFrame:
    """Small typed edge list on raw keys (for CC/BFS/degree operators):
    supplier s<k> → nation n<k> → region r<k>."""
    t = load_tables(spark, sf_dir, ["supplier", "nation", "region"])
    sn = t["supplier"].select(
        F.concat(F.lit("s"), F.col("s_suppkey")).alias("src"),
        F.lit("LOCATED_IN").alias("rel"),
        F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
    )
    nr = t["nation"].select(
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("src"),
        F.lit("PART_OF").alias("rel"),
        F.concat(F.lit("r"), F.col("n_regionkey")).alias("dst"),
    )
    return sn.unionByName(nr)
