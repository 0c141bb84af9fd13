"""Scale-stress for the dedup/ANN suite (VERDICT r4 item 6).

The KG scaling study (tools/bench_scaling.py) only measures the
pipeline; this sibling stresses the near-dup/ANN operators on a
synthetic ≥1M-doc corpus with a Zipf-hub near-dup cluster and proves
the Σ-bucket² claim empirically: runtime grows sub-quadratically in
corpus size (the all-pairs shapes would grow ~16× from N→4N docs; the
bucketed paths grow ~4×, plus shuffle constants), and no leg OOMs.

Corpus design (generated fully distributed — spark.range + JVM
expressions, no driver-side rows, so the generator itself holds at
100 TB shape):
  - 60% unique docs          (template = own id → no near-dups)
  - 30% small clusters       (groups of 4 consecutive ids share a
                              template; one mutated word per doc →
                              3-shingle Jaccard ≈ 0.85, well above the
                              0.5 confirm threshold)
  - 10% Zipf hub             (90% of these share ONE template → a
                              single ~0.09·D-doc boilerplate cluster;
                              its band buckets blow past max_bucket and
                              are dropped via the observable
                              lsh_oversized_buckets log — that cap IS
                              the sub-quadratic guarantee under skew)
Embeddings (dim 16) derive from the same template with per-doc noise,
so ANN sees the same hub skew; IVF bucket fan-out is bounded by the
centroid count, not the hub.

Usage:
    python tools/bench_dedup_scale.py                    # 256k → 1M
    KGSPARK_DEDUP_SCALE_SIZES=100000,400000 python tools/bench_dedup_scale.py
Prints one JSON line: per-size per-op seconds + row counts, size
ratio, time ratios, and the sub-quadratic verdict per op.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgspark import runtime
from kgspark.operators import dedup, similarity
from kgspark.session import get_spark

SIZES = tuple(
    int(x)
    for x in os.environ.get("KGSPARK_DEDUP_SCALE_SIZES", "262144,1048576").split(",")
)
DIM = 16
N_CENTROIDS = 64
N_QUERIES = 64
WORDS_PER_DOC = 40
MAX_BUCKET = int(os.environ.get("KGSPARK_DEDUP_SCALE_MAX_BUCKET", "10000"))


def synth_docs(spark: SparkSession, n: int) -> DataFrame:
    """(doc_id, text) with the 60/30/10 unique/cluster/hub mix."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    mod = F.col("doc_id") % 10
    template = (
        F.when(mod < 6, F.col("doc_id"))  # unique
        .when(
            mod < 9,  # small clusters of ≤4 consecutive eligible ids
            (F.col("doc_id") - (F.col("doc_id") % 40)) + F.lit(2**40),
        )
        .otherwise(  # Zipf hub: 90% of this class → one giant template
            F.when(F.col("doc_id") % 100 < 90, F.lit(2**41)).otherwise(
                F.lit(2**41) + F.col("doc_id") % 7 + 1
            )
        )
    )
    t = base.withColumn("template", template)
    # 40 words from the template stream; ONE word mutated per doc so
    # cluster members are near- but not exact-duplicates
    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
        lambda p: F.when(
            p == (F.col("doc_id") % WORDS_PER_DOC),
            F.concat(F.lit("m"), (F.col("doc_id") % 9973).cast("string")),
        ).otherwise(
            F.concat(
                F.lit("w"),
                ((F.col("template") * 31 + p * 7) % 49999).cast("string"),
            )
        ),
    )
    return t.select("doc_id", F.array_join(words, " ").alias("text"), "template")


def synth_vectors(docs: DataFrame) -> DataFrame:
    """(vec_id, embedding): template-anchored with per-doc noise."""
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            ((F.col("template") * 31 + j * 7) % 997) / 997.0
            + ((F.col("doc_id") * 13 + j) % 101) / 10100.0
        ).cast("float"),
    )
    return docs.select(F.col("doc_id").alias("vec_id"), emb.alias("embedding"))


def synth_centroids(spark: SparkSession) -> DataFrame:
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (((F.col("id") * 37 + j * 11) % 1009) / 1009.0).cast("float"),
    )
    return spark.range(N_CENTROIDS).select(
        F.col("id").alias("centroid_id"), emb.alias("embedding")
    )


def timed(name: str, fn, out: dict) -> None:
    t0 = time.time()
    rows = fn()
    sec = time.time() - t0
    out[name] = {"rows": rows, "sec": round(sec, 2)}
    print(f"  {name}: {rows} rows in {sec:.1f}s", file=sys.stderr)
    runtime.release_materialized()


def run_size(spark: SparkSession, n: int) -> dict:
    from pyspark import StorageLevel

    print(f"--- corpus size {n} ---", file=sys.stderr)
    # persisted directly (not via runtime.materialize) so the
    # release_materialized() between timed ops leaves the corpus cached
    docs = synth_docs(spark, n).repartition(64, "doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    docs.count()  # settle the corpus before the timed ops
    out: dict = {"n_docs": n}

    def lsh_pairs():
        sigs = runtime.materialize(dedup.minhash_signatures(docs))
        banded = dedup.lsh_banded(sigs)
        dropped = (
            dedup.lsh_oversized_buckets(banded, MAX_BUCKET)
            .agg(F.count("*").alias("b"), F.sum("bucket_size").alias("docs"))
            .collect()[0]
        )
        out["oversized_buckets"] = {
            "buckets": dropped["b"] or 0,
            "member_rows": int(dropped["docs"] or 0),
        }
        return dedup.lsh_candidate_pairs(sigs, max_bucket=MAX_BUCKET).count()

    timed("minhash_lsh_pairs", lsh_pairs, out)
    timed(
        "neardup_clusters",
        lambda: dedup.neardup_clusters(docs, max_bucket=MAX_BUCKET)
        .filter(F.col("is_dup") == 1)
        .count(),
        out,
    )

    vectors = synth_vectors(docs)
    centroids = synth_centroids(spark)
    queries = synth_vectors(
        synth_docs(spark, N_QUERIES).withColumn(
            "doc_id", F.col("doc_id") + 7_000_000_000
        )
    )
    timed(
        "ann_ivf_topk",
        lambda: similarity.ivf_topk(
            vectors, queries, centroids, k=10, nprobe=2
        ).count(),
        out,
    )
    docs.unpersist(blocking=False)
    return out


def main() -> None:
    if len(SIZES) != 2 or SIZES[0] >= SIZES[1]:
        raise SystemExit(f"need 2 increasing sizes, got {SIZES}")
    spark = get_spark(
        "kgspark-dedup-scale", master="local[32]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    legs = {n: run_size(spark, n) for n in SIZES}
    small, big = SIZES
    ratio_n = big / small
    verdict = {}
    for op in ("minhash_lsh_pairs", "neardup_clusters", "ann_ivf_topk"):
        tr = legs[big][op]["sec"] / max(legs[small][op]["sec"], 1e-9)
        verdict[op] = {
            "time_ratio": round(tr, 2),
            # sub-quadratic: time grows slower than (size ratio)² —
            # with generous headroom for fixed costs and box noise we
            # require < half of quadratic growth
            "subquadratic": tr < (ratio_n**2) / 2,
        }
    print(
        json.dumps(
            {
                "sizes": list(SIZES),
                "size_ratio": ratio_n,
                "legs": {str(k): v for k, v in legs.items()},
                "verdict": verdict,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
