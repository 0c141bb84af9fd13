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
from pyspark import StorageLevel

from kgspark.runtime import materialize

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


def prepare_facts(
    facts: DataFrame, order_col: str = "row_idx", extra_cols: list[str] | None = None
) -> DataFrame:
    """Trim all fact columns, apply the Provider∧Patient row gate, and
    precompute URIs. One narrow pass, one UDF site per name column
    (Arrow-batched).

    Deliberately does NOT materialize the multi-value split arrays:
    this DataFrame gets persisted and Spark's in-memory columnar cache
    is several-fold slower building array<string> columns than plain
    strings; branches recompute the (cheap, codegen'd) split instead.
    """
    if order_col not in facts.columns:
        raise ValueError(f"facts must carry a stable source-order column {order_col!r}")
    df = trim_all(facts, FACT_COLUMNS)
    df = df.filter((F.col("Provider") != "") & (F.col("Patient") != ""))
    keep = [F.col(order_col)]
    if extra_cols:
        keep += [F.col(c) for c in extra_cols]
    return df.select(
        *keep,
        *FACT_COLUMNS,
        mint_uri_col(F.col("Provider")).alias("prov_uri"),
        mint_uri_col(F.col("Patient")).alias("pat_uri"),
    )


def _specs_arr():
    return multi_or_raw_col(F.col("Specialization"))


def _locs_arr():
    return multi_or_raw_col(F.col("Location"))


def _conds_arr():
    return multi_or_raw_col(F.col("Patient_Condition"))


def mention_stream(
    base: DataFrame, order_col: str = "row_idx", extra_cols: list[str] | None = None
) -> DataFrame:
    """Exploded entity-mention stream ``(row_idx, seq, kind, label, uri)``.

    ``(row_idx, seq)`` totally orders mentions exactly as the reference's
    sequential loop visits them: provider, patient, specializations in
    split order, then locations (build_rdf.py:169-179).
    """
    ridx = F.col(order_col)
    extras = [F.col(c) for c in (extra_cols or [])]
    extra_names = list(extra_cols or [])
    prov = base.select(
        ridx.alias("row_idx"),
        F.lit(0).alias("seq"),
        F.lit("Provider").alias("kind"),
        F.col("Provider").alias("label"),
        F.col("prov_uri").alias("uri"),
        *extras,
    )
    pat = base.select(
        ridx.alias("row_idx"),
        F.lit(1).alias("seq"),
        F.lit("Patient").alias("kind"),
        F.col("Patient").alias("label"),
        F.col("pat_uri").alias("uri"),
        *extras,
    )
    spec = base.select(
        ridx.alias("row_idx"),
        F.posexplode(_specs_arr()).alias("pos", "label"),
        *extras,
    ).select(
        "row_idx",
        (F.lit(2) + F.col("pos")).alias("seq"),
        F.lit("Specialization").alias("kind"),
        "label",
        mint_uri_col(F.col("label")).alias("uri"),
        *extra_names,
    )
    loc = base.select(
        ridx.alias("row_idx"),
        F.size(_specs_arr()).alias("nspec"),
        F.posexplode(_locs_arr()).alias("pos", "label"),
        *extras,
    ).select(
        "row_idx",
        (F.lit(2) + F.col("nspec") + F.col("pos")).alias("seq"),
        F.lit("Location").alias("kind"),
        "label",
        mint_uri_col(F.col("label")).alias("uri"),
        *extra_names,
    )
    return prov.unionByName(pat).unionByName(spec).unionByName(loc)


def triple_parts(
    facts: DataFrame,
    order_col: str = "row_idx",
    persist_base: bool = True,
    provenance_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The mergeable decomposition of ``build_triples``.

    Returns ``(set_stream, attr_candidates)``:

    - ``set_stream`` — every set-semantics triple candidate (types,
      SPECIALIZES_IN / LOCATED_AT / TREATS edges, conditions) with a
      trailing ``src_doc`` column; final form is a plain set-dedup.
    - ``attr_candidates`` — first-wins attribute candidates
      ``(uri, attr, o1, o2, v, p)``; final form is
      ``attr_state_to_triples(reduce_attr_state(attr_candidates))``.

    Both halves merge **associatively** across any partitioning of the
    fact rows: ``dedup(A ∪ B) = dedup(dedup(A) ∪ dedup(B))`` and
    ``min-reduce(A ∪ B) = min-reduce(min-reduce(A) ∪ min-reduce(B))``.
    That associativity is what the incremental pipeline stage
    (streaming/incremental.py incremental_link_triples) relies on to
    fold a new micro-batch into persisted state and still produce
    tables bit-identical to a one-shot batch run.
    """
    extra = [provenance_col] if provenance_col else []
    base = prepare_facts(facts, order_col, extra)
    if persist_base:
        # materialize(), not raw persist(): this was the one reuse
        # boundary release_materialized() could not free — every bench
        # run of kg_pipeline_triples (and every pipeline run) pinned a
        # dead cached copy of the fact base for the session's lifetime.
        # The explicit level keeps raw persist()'s deserialized cache
        # (base is read by nine narrow branches within a single job;
        # a serialized cache would pay per-branch decode).
        base = materialize(base, level=StorageLevel.MEMORY_AND_DISK_DESER)
    mentions = mention_stream(base, order_col, extra_cols=extra)
    ridx = F.col(order_col)
    prov = F.col(provenance_col) if provenance_col else F.lit(None).cast("string")

    # --- narrow branches (no shuffle of their own; final dedup collapses
    # repeats, so e.g. type triples need no per-branch distinct) ----------
    cls = F.element_at(
        F.create_map(*[F.lit(x) for kv in KIND_TO_CLASS.items() for x in kv]),
        F.col("kind"),
    )
    type_triples = mentions.select(*_uri_triple(F.col("uri"), RDF_TYPE, cls), prov.alias("src_doc"))

    spec_edges = base.select(
        prov.alias("src_doc"), F.col("prov_uri"), F.explode(_specs_arr()).alias("part")
    ).select(*_uri_triple(F.col("prov_uri"), P_SPECIALIZES_IN, mint_uri_col(F.col("part"))), "src_doc")
    loc_edges = base.select(
        prov.alias("src_doc"), F.col("prov_uri"), F.explode(_locs_arr()).alias("part")
    ).select(*_uri_triple(F.col("prov_uri"), P_LOCATED_AT, mint_uri_col(F.col("part"))), "src_doc")
    treats_edges = base.select(*_uri_triple(F.col("prov_uri"), P_TREATS, F.col("pat_uri")), prov.alias("src_doc"))
    cond_triples = base.select(
        prov.alias("src_doc"), F.col("pat_uri"), F.explode(_conds_arr()).alias("part")
    ).select(*_lit_triple(F.col("pat_uri"), P_CONDITION, F.col("part")), "src_doc")

    # --- ONE fused ordered-first aggregation for every first-wins
    # attribute (name/bio/gender/age), keyed (uri, attr) — a single
    # shuffle instead of four (stage latency dominates at the low end;
    # at the high end one wide partial-agg beats four narrow ones) -------
    def attr_rows(df, key: str, attr: str, value, seq):
        return df.select(
            F.col(key).alias("uri"),
            F.lit(attr).alias("attr"),
            ridx.alias("o1"),
            seq.alias("o2"),
            value.alias("v"),
            prov.alias("p"),
        )

    zero = F.lit(0)
    firsts_in = (
        attr_rows(mentions, "uri", "name", F.col("label"), F.col("seq"))
        .unionByName(attr_rows(base.filter(F.col("Bio") != ""), "prov_uri", "bio", F.col("Bio"), zero))
        .unionByName(attr_rows(base.filter(F.col("Patient_Gender") != ""), "pat_uri", "gender", F.col("Patient_Gender"), zero))
        .unionByName(attr_rows(base.filter(F.col("Patient_Age") != ""), "pat_uri", "age", F.col("Patient_Age"), zero))
    )
    set_stream = (
        type_triples.unionByName(spec_edges)
        .unionByName(loc_edges)
        .unionByName(treats_edges)
        .unionByName(cond_triples)
    )
    return set_stream, firsts_in


def reduce_attr_state(attr_candidates: DataFrame) -> DataFrame:
    """Min-reduce first-wins candidates to one winner per (uri, attr).

    Associative: re-reducing a union of already-reduced states gives
    the same winners — the incremental merge operator for attr state.
    """
    return attr_candidates.groupBy("uri", "attr").agg(
        F.min(F.struct("o1", "o2", "v", "p")).alias("w")
    )


def attr_state_to_triples(firsts: DataFrame) -> DataFrame:
    """Reduced attr state → literal triples (+ trailing src_doc)."""
    parsed = firsts.withColumn(
        "parsed",
        F.when(F.col("attr") == "age", age_literal_udf(F.col("w.v"))).otherwise(
            F.struct(
                F.col("w.v").alias("lex"), F.lit(None).cast("string").alias("dtype")
            )
        ),
    )
    attr_pred = F.create_map(
        *[F.lit(x) for kv in
          {"name": P_NAME, "bio": P_BIO, "gender": P_GENDER, "age": P_AGE}.items()
          for x in kv]
    )
    return parsed.select(
        F.col("uri").alias("subj"),
        F.element_at(attr_pred, F.col("attr")).alias("pred"),
        F.col("parsed.lex").alias("obj"),
        F.lit(KIND_LITERAL).alias("obj_kind"),
        F.col("parsed.dtype").alias("obj_dtype"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.col("w.p").alias("src_doc"),
    )


def build_triples(
    facts: DataFrame,
    order_col: str = "row_idx",
    persist_base: bool = True,
    provenance_col: str | None = None,
) -> DataFrame:
    """Fact rows → deduplicated triples DataFrame (schema: TRIPLE_COLUMNS).

    Set-equal to ``kgspark.golden.fact_rows_to_triples`` on any input
    (asserted by tests/test_golden_rdf.py at P/R = 1.0).

    With ``provenance_col``, the set-dedup becomes a group-by keeping
    the min source value per distinct triple in a trailing
    ``source_ref`` column — same triple set, plus lineage (the
    reference's ``source_document`` stamping, B9/H2). Pass a COMPACT
    reference (e.g. ``xxhash64(url)``), not the url string: the value
    rides every triple-candidate row through the dedup shuffle.
    """
    set_stream, attr_candidates = triple_parts(
        facts, order_col, persist_base, provenance_col
    )
    attr_triples = attr_state_to_triples(reduce_attr_state(attr_candidates))
    out = set_stream.unionByName(attr_triples.select(*TRIPLE_COLUMNS, "src_doc"))
    if provenance_col:
        return out.groupBy(*TRIPLE_COLUMNS).agg(
            F.min("src_doc").alias("source_ref")
        )
    return out.drop("src_doc").dropDuplicates(TRIPLE_COLUMNS)


def ontology_df(spark: SparkSession) -> DataFrame:
    """The static RDFS schema graph as a (tiny, broadcastable) DataFrame."""
    rows = sorted(golden.ontology_triples())
    return spark.createDataFrame(rows, schema=_TRIPLE_SCHEMA)
