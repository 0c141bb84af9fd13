"""Physical-plan quality gates: pushdown, broadcast, pruning, no rogue
Python in hot paths. These assertions keep the plans we iterated to —
a regression here is a performance bug even when results stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark.entrypoints import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_range_filter_pushes_to_parquet(spark):
    plan = physical(QUERIES["scalar_filters"](spark, SF_DIR))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("GreaterThanOrEqual(c_acctbal" in ln for ln in pushed), plan


def test_anchor_join_broadcasts(spark):
    plan = physical(QUERIES["traverse_1hop"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_agg_count_avg_broadcasts_dim(spark):
    plan = physical(QUERIES["agg_count_avg"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_textops_stay_jvm_side(spark):
    """Quality/lang-id/fingerprint/token plans must contain no Python
    evaluation operators — everything whole-stage-codegen'd."""
    for name in ["quality_features", "lang_id", "doc_fingerprint", "token_counts",
                 "minhash_lsh_pairs", "simhash_neardup_pairs",
                 "ann_cosine_topk"]:
        plan = physical(QUERIES[name](spark, SF_DIR))
        assert "EvalPython" not in plan, (name, plan)


def test_signature_computation_stays_jvm_side(spark):
    """The banding queries localCheckpoint their signature tables, which
    hides everything upstream behind a Scan ExistingRDD in their plans —
    so assert on the UNcheckpointed signature frames directly: the
    heaviest dedup computations must carry no Python evaluation."""
    from kgspark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for frame in [
        dedup.simhash(docs),
        dedup.minhash_signatures(docs),
        dedup.lsh_banded(dedup.minhash_signatures(docs)),
    ]:
        plan = physical(frame)
        assert "EvalPython" not in plan, plan
        assert "Scan ExistingRDD" not in plan, plan


def test_edge_partition_pruning(spark, tmp_path):
    """Pipeline edge tables are partitioned by rel; a rel-filtered scan
    must show a PartitionFilters entry pruning to one directory."""
    edges = spark.createDataFrame(
        [("a", "TREATS", "b"), ("a", "LOCATED_AT", "c"), ("d", "TREATS", "e")],
        "src string, rel string, dst string",
    )
    path = str(tmp_path / "edges")
    edges.write.partitionBy("rel").parquet(path)
    scan = spark.read.parquet(path).filter(F.col("rel") == "TREATS")
    plan = physical(scan)
    assert "PartitionFilters" in plan and "TREATS" in plan, plan
    assert scan.count() == 2


def test_neardup_lsh_has_no_nested_loop_join(spark):
    """The embedding near-dup scale path must never plan an all-pairs
    BroadcastNestedLoopJoin — candidates come from band-bucket hash
    joins only."""
    plan = physical(QUERIES["ann_neardup_pairs"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_fulltext_top1_plans_take_ordered(spark):
    plan = physical(QUERIES["fulltext_top1"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
