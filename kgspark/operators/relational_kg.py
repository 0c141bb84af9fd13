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


def _entity(df: DataFrame, name_col: str, cls: str) -> DataFrame:
    uri = mint_uri_col(F.trim(F.col(name_col)))
    t = df.select(
        uri.alias("subj"),
        F.lit(RDF_TYPE).alias("pred"),
        F.lit(cls).alias("obj"),
        F.lit(KIND_URI).alias("obj_kind"),
        F.lit(None).cast("string").alias("obj_dtype"),
        F.lit(None).cast("string").alias("obj_lang"),
    )
    n = df.select(
        uri.alias("subj"),
        F.lit(P_NAME_R).alias("pred"),
        F.trim(F.col(name_col)).alias("obj"),
        F.lit(KIND_LITERAL).alias("obj_kind"),
        F.lit(None).cast("string").alias("obj_dtype"),
        F.lit(None).cast("string").alias("obj_lang"),
    )
    return t.unionByName(n)


def _edge(df: DataFrame, src_name, pred: str, dst_name) -> DataFrame:
    return df.select(
        mint_uri_col(F.trim(src_name)).alias("subj"),
        F.lit(pred).alias("pred"),
        mint_uri_col(F.trim(dst_name)).alias("obj"),
        F.lit(KIND_URI).alias("obj_kind"),
        F.lit(None).cast("string").alias("obj_dtype"),
        F.lit(None).cast("string").alias("obj_lang"),
    )


def build_geo_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer/supplier/nation/region → deduplicated triples table.

    Join strategy: nation (25 rows) and region (5 rows) broadcast onto
    the big fact tables — no shuffle for edge derivation; the only
    shuffle is the final set-dedup, keyed by the (uniform) triple hash.
    """
    t = load_tables(spark, sf_dir, ["customer", "supplier", "nation", "region"])
    nation = F.broadcast(t["nation"])
    region = F.broadcast(t["region"])

    cust_nat = t["customer"].join(nation, t["customer"].c_nationkey == nation.n_nationkey)
    supp_nat = t["supplier"].join(nation, t["supplier"].s_nationkey == nation.n_nationkey)
    nat_reg = t["nation"].join(region, t["nation"].n_regionkey == region.r_regionkey)

    parts = [
        _entity(t["customer"], "c_name", CLS_CUSTOMER),
        _entity(t["supplier"], "s_name", CLS_SUPPLIER),
        _entity(t["nation"], "n_name", CLS_NATION),
        _entity(t["region"], "r_name", CLS_REGION),
        _edge(cust_nat, F.col("c_name"), P_LOCATED_IN, F.col("n_name")),
        _edge(supp_nat, F.col("s_name"), P_LOCATED_IN, F.col("n_name")),
        _edge(nat_reg, F.col("n_name"), P_PART_OF, F.col("r_name")),
        # literal attributes (acctbal as canonical-form decimal string)
        t["customer"].select(
            mint_uri_col(F.trim(F.col("c_name"))).alias("subj"),
            F.lit(P_ACCTBAL).alias("pred"),
            F.format_string("%.2f", F.col("c_acctbal")).alias("obj"),
            F.lit(KIND_LITERAL).alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_dtype"),
            F.lit(None).cast("string").alias("obj_lang"),
        ),
        t["customer"].select(
            mint_uri_col(F.trim(F.col("c_name"))).alias("subj"),
            F.lit(P_SEGMENT).alias("pred"),
            F.col("c_mktsegment").alias("obj"),
            F.lit(KIND_LITERAL).alias("obj_kind"),
            F.lit(None).cast("string").alias("obj_dtype"),
            F.lit(None).cast("string").alias("obj_lang"),
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
