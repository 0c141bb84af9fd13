"""Distributed fact-rows → RDF-triples builder (SURVEY.md §2 ops A1, B1-B5, C1-C4, EP1).

Spark-first re-expression of the reference's single-process CSV→RDF pass
(``/root/reference/scripts/build_rdf.py:112-205``). The reference's
``uri_cache`` / ``single_set`` mutable-state semantics become order-free
relational operations:

- entity memoization            → ``distinct()`` over the mention stream (C1)
- first-wins name/bio/gender/age → ``min(struct(order, value))`` per entity
  URI — an ordered-first aggregate with map-side partial aggregation (C2)
- rdflib Graph set semantics     → ``dropDuplicates`` over the triple stream (C4)

Scale notes (10^12-row target):
- One wide pass computes slugs/URIs for all four mention kinds; the
  four triple families branch off it, so the expensive input scan is
  shared via an optional persist.
- All aggregations key on entity URI — Zipf-skewed (hub providers).
  Partial aggregation (min/min_by, distinct pre-aggregation) absorbs
  head keys map-side; AQE skew-join/partition-split handles the rest.
  No salting is needed because every agg here is algebraic.
- The caller provides a stable ``row_idx`` (source order). Never use
  ``monotonically_increasing_id`` across runs — resume would break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark import golden
from kgspark.constants import (
    FACT_COLUMNS,
    KIND_LITERAL,
    KIND_TO_CLASS,
    KIND_URI,
    P_AGE,
    P_BIO,
    P_CONDITION,
    P_GENDER,
    P_LOCATED_AT,
    P_NAME,
    P_SPECIALIZES_IN,
    P_TREATS,
    RDF_TYPE,
    TRIPLE_COLUMNS,
)
from kgspark.functions.textfns import (
    age_literal_udf,
    mint_uri_col,
    multi_or_raw_col,
    trim_all,
)

_TRIPLE_SCHEMA = "subj string, pred string, obj string, obj_kind string, obj_dtype string, obj_lang string"


def _uri_triple(subj, pred: str, obj):
    return [
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        obj.alias("obj"),
        F.lit(KIND_URI).alias("obj_kind"),
        F.lit(None).cast("string").alias("obj_dtype"),
        F.lit(None).cast("string").alias("obj_lang"),
    ]


def _lit_triple(subj, pred: str, obj, dtype=None):
    return [
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        obj.alias("obj"),
        F.lit(KIND_LITERAL).alias("obj_kind"),
        (dtype if dtype is not None else F.lit(None).cast("string")).alias("obj_dtype"),
        F.lit(None).cast("string").alias("obj_lang"),
    ]


def prepare_facts(facts: DataFrame, order_col: str = "row_idx") -> DataFrame:
    """Trim all fact columns, apply the Provider∧Patient row gate, and
    precompute URIs + multi-value arrays. One narrow pass, one UDF site
    per name column (Arrow-batched)."""
    if order_col not in facts.columns:
        raise ValueError(f"facts must carry a stable source-order column {order_col!r}")
    df = trim_all(facts, FACT_COLUMNS)
    df = df.filter((F.col("Provider") != "") & (F.col("Patient") != ""))
    return (
        df.withColumn("specs_arr", multi_or_raw_col(F.col("Specialization")))
        .withColumn("locs_arr", multi_or_raw_col(F.col("Location")))
        .withColumn("conds_arr", multi_or_raw_col(F.col("Patient_Condition")))
        .withColumn("prov_uri", mint_uri_col(F.col("Provider")))
        .withColumn("pat_uri", mint_uri_col(F.col("Patient")))
    )


def mention_stream(base: DataFrame, order_col: str = "row_idx") -> DataFrame:
    """Exploded entity-mention stream ``(row_idx, seq, kind, label, uri)``.

    ``(row_idx, seq)`` totally orders mentions exactly as the reference's
    sequential loop visits them: provider, patient, specializations in
    split order, then locations (build_rdf.py:169-179).
    """
    ridx = F.col(order_col)
    prov = base.select(
        ridx.alias("row_idx"),
        F.lit(0).alias("seq"),
        F.lit("Provider").alias("kind"),
        F.col("Provider").alias("label"),
        F.col("prov_uri").alias("uri"),
    )
    pat = base.select(
        ridx.alias("row_idx"),
        F.lit(1).alias("seq"),
        F.lit("Patient").alias("kind"),
        F.col("Patient").alias("label"),
        F.col("pat_uri").alias("uri"),
    )
    spec = base.select(
        ridx.alias("row_idx"),
        F.posexplode("specs_arr").alias("pos", "label"),
    ).select(
        "row_idx",
        (F.lit(2) + F.col("pos")).alias("seq"),
        F.lit("Specialization").alias("kind"),
        "label",
        mint_uri_col(F.col("label")).alias("uri"),
    )
    loc = base.select(
        ridx.alias("row_idx"),
        F.size("specs_arr").alias("nspec"),
        F.posexplode("locs_arr").alias("pos", "label"),
    ).select(
        "row_idx",
        (F.lit(2) + F.col("nspec") + F.col("pos")).alias("seq"),
        F.lit("Location").alias("kind"),
        "label",
        mint_uri_col(F.col("label")).alias("uri"),
    )
    return prov.unionByName(pat).unionByName(spec).unionByName(loc)


def build_triples(
    facts: DataFrame,
    order_col: str = "row_idx",
    persist_base: bool = True,
) -> DataFrame:
    """Fact rows → deduplicated triples DataFrame (schema: TRIPLE_COLUMNS).

    Set-equal to ``kgspark.golden.fact_rows_to_triples`` on any input
    (asserted by tests/test_golden_rdf.py at P/R = 1.0).
    """
    base = prepare_facts(facts, order_col)
    if persist_base:
        base = base.persist()
    mentions = mention_stream(base, order_col)

    # kind → class URI (literal CASE expression; whole-stage codegen)
    cls = F.element_at(
        F.create_map(*[F.lit(x) for kv in KIND_TO_CLASS.items() for x in kv]),
        F.col("kind"),
    )
    type_triples = mentions.select(*_uri_triple(F.col("uri"), RDF_TYPE, cls)).distinct()

    # first mention (by row, then within-row seq) names the URI
    name_triples = (
        mentions.groupBy("uri")
        .agg(F.min(F.struct("row_idx", "seq", "label")).alias("w"))
        .select(*_lit_triple(F.col("uri"), P_NAME, F.col("w.label")))
    )

    ridx = F.col(order_col)
    spec_edges = base.select(
        "prov_uri", F.explode("specs_arr").alias("part")
    ).select(*_uri_triple(F.col("prov_uri"), P_SPECIALIZES_IN, mint_uri_col(F.col("part"))))
    loc_edges = base.select(
        "prov_uri", F.explode("locs_arr").alias("part")
    ).select(*_uri_triple(F.col("prov_uri"), P_LOCATED_AT, mint_uri_col(F.col("part"))))
    treats_edges = base.select(*_uri_triple(F.col("prov_uri"), P_TREATS, F.col("pat_uri")))

    def first_nonempty(df: DataFrame, key: str, value: str, pred: str) -> DataFrame:
        return (
            df.filter(F.col(value) != "")
            .groupBy(key)
            .agg(F.min(F.struct(ridx.alias("o"), F.col(value).alias("v"))).alias("w"))
            .select(*_lit_triple(F.col(key), pred, F.col("w.v")))
        )

    bio_triples = first_nonempty(base, "prov_uri", "Bio", P_BIO)
    gender_triples = first_nonempty(base, "pat_uri", "Patient_Gender", P_GENDER)

    age_first = (
        base.filter(F.col("Patient_Age") != "")
        .groupBy("pat_uri")
        .agg(F.min(F.struct(ridx.alias("o"), F.col("Patient_Age").alias("v"))).alias("w"))
        .withColumn("parsed", age_literal_udf(F.col("w.v")))
    )
    age_triples = age_first.select(
        *_lit_triple(F.col("pat_uri"), P_AGE, F.col("parsed.lex"), F.col("parsed.dtype"))
    )

    cond_triples = base.select("pat_uri", F.explode("conds_arr").alias("part")).select(
        *_lit_triple(F.col("pat_uri"), P_CONDITION, F.col("part"))
    )

    out = (
        type_triples.unionByName(name_triples)
        .unionByName(spec_edges)
        .unionByName(loc_edges)
        .unionByName(treats_edges)
        .unionByName(bio_triples)
        .unionByName(gender_triples)
        .unionByName(age_triples)
        .unionByName(cond_triples)
    )
    return out.dropDuplicates(TRIPLE_COLUMNS)


def ontology_df(spark: SparkSession) -> DataFrame:
    """The static RDFS schema graph as a (tiny, broadcastable) DataFrame."""
    rows = sorted(golden.ontology_triples())
    return spark.createDataFrame(rows, schema=_TRIPLE_SCHEMA)
