"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus the KG
pipeline (datagen corpus sized by sf) and prints ONE JSON line:

    {"metric": "e2e_sec", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "pipeline": {...docs/sec, triples/sec...}}

Every query is forced end-to-end by hashing all of its columns (a bare
count() would let Catalyst prune the computed columns away).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

# The full query registry is benchmarked (kgspark/entrypoints.py
# _REGISTRY_ORDER); resolved at runtime so bench coverage can never
# drift from the driver's correctness surface.


def force(df: DataFrame) -> int:
    """Fully evaluate every column of df; returns row count."""
    row = df.select(
        F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
    ).agg(F.count("*").alias("n"), F.bit_xor("h")).first()
    return row["n"]


def bench_pipeline(spark, n_pages: int, out_dir: str, replicate: int = 1) -> dict:
    """Generate a corpus, run the full pipeline, report throughputs.

    ``replicate`` multiplies the page set Spark-side (distinct urls) to
    scale extraction work without driver-side generation cost.
    """
    from kgspark import datagen
    from kgspark.plans.pipeline import run_pipeline

    corpus = datagen.generate_corpus(n_pages=n_pages, seed=13)
    pages, aliases, canonicals = datagen.corpus_to_spark(spark, corpus)
    if replicate > 1:
        reps = spark.range(replicate).select(F.col("id").alias("rep"))
        pages = pages.crossJoin(reps).withColumn(
            "url", F.concat(F.col("url"), F.lit("?rep="), F.col("rep"))
        ).drop("rep")
    src_path = f"{out_dir}/webpages"
    pages.repartition(64).write.mode("overwrite").parquet(src_path)
    pages = spark.read.parquet(src_path)
    n_docs = n_pages * replicate

    t0 = time.time()
    metrics = run_pipeline(
        spark,
        pages,
        aliases,
        f"{out_dir}/kg",
        snapshot=f"bench-{n_pages}-{replicate}",
        canonicals=canonicals,
        n_buckets=64,
    )
    wall = time.time() - t0
    n_triples = metrics["triples"]["rows"]
    return {
        "docs": n_docs,
        "triples": n_triples,
        "pipeline_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 1),
        "triples_per_sec": round(n_triples / wall, 1),
        "extract_sec": metrics["extract"]["sec"],
        "stage_sec": {
            k: v.get("sec") for k, v in metrics.items() if isinstance(v, dict)
        },
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # parse the scale factor from a trailing 'sf<number>' path component;
    # any other path shape (or 'sf' mid-word, e.g. /data/transfer) falls
    # back to the default instead of crashing float()
    m = re.search(r"sf(\d+(?:\.\d+)?)/*$", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from kgspark.entrypoints import QUERIES
    from kgspark.session import get_spark

    spark = get_spark("kgspark-bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM codegen, Python worker pool, AQE paths — not timed
    from kgspark.functions.textfns import slugify_udf

    warm = spark.range(10000).select(F.col("id").cast("string").alias("s"))
    force(warm.select(slugify_udf(F.col("s")).alias("x")).groupBy("x").count())

    bench_queries = list(QUERIES)

    from kgspark.runtime import release_materialized

    # untimed warm pass: parquet footer/page cache, per-shape codegen
    for name in bench_queries:
        force(QUERIES[name](spark, sf_dir))
        release_materialized()

    # median of N timed runs to tame run-to-run VM noise; default 3
    # because the median of 2 samples is just their mean — only an odd
    # count actually rejects a single outlier
    n_runs = int(os.environ.get("KGSPARK_BENCH_RUNS", "3"))
    samples: dict[str, list[float]] = {name: [] for name in bench_queries}
    for _ in range(n_runs):
        for name in bench_queries:
            t0 = time.time()
            force(QUERIES[name](spark, sf_dir))
            samples[name].append(time.time() - t0)
            # free the reuse-boundary persists this query registered:
            # 50 queries x N runs would otherwise accumulate dead
            # cached blocks for the whole session (runtime.py)
            release_materialized()

    queries: dict[str, float] = {}
    total = 0.0
    for name in bench_queries:
        dt = statistics.median(samples[name])
        queries[name] = round(dt, 3)
        total += dt

    # the pipeline stage gets the same median-of-N treatment as the
    # queries (it is the single largest contributor to the total, so a
    # one-run reading dominated run-to-run noise in the round-3 driver
    # capture); report the median run's full metrics dict
    runs = []
    for i in range(n_runs):
        out_dir = tempfile.mkdtemp(prefix="kgspark-bench-")
        try:
            runs.append(
                bench_pipeline(
                    spark,
                    n_pages=max(int(20000 * sf), 200),
                    out_dir=out_dir,
                    replicate=4,
                )
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
    runs.sort(key=lambda r: r["pipeline_sec"])
    # true median: odd counts take the middle run; even counts take the
    # lower-middle run's dict but average the two middle runs' timing
    # fields (either middle alone would bias the reported pipeline term
    # relative to the queries' statistics.median)
    lo = runs[(len(runs) - 1) // 2]
    hi = runs[len(runs) // 2]
    pipeline = dict(lo)
    if hi is not lo:
        for k in ("pipeline_sec", "docs_per_sec", "triples_per_sec",
                  "extract_sec"):
            if k in lo and k in hi:
                pipeline[k] = round((lo[k] + hi[k]) / 2, 3)
        if "stage_sec" in lo and "stage_sec" in hi:
            pipeline["stage_sec"] = {
                k: round((v + hi["stage_sec"][k]) / 2, 3)
                if isinstance(v, (int, float))
                and isinstance(hi["stage_sec"].get(k), (int, float))
                else v
                for k, v in lo["stage_sec"].items()
            }
    total += pipeline["pipeline_sec"]

    # Box-state calibration, so readings are comparable ACROSS sessions:
    # the sandbox VM's single-core speed is stable but its per-Spark-job
    # overhead has been observed to move >10x between sessions (same
    # code, same data). cpu_mops = single-process busy-loop throughput;
    # spark_job_ms = median wall of a trivial 32-task count — together
    # they say whether a total moved because the engine changed or the
    # box did.
    t0 = time.time()
    acc = 0
    for i in range(20_000_000):
        acc += i * i % 7
    cpu_mops = round(20_000_000 / (time.time() - t0) / 1e6, 1)
    noop = []
    for _ in range(5):
        t0 = time.time()
        spark.range(1_000_000, numPartitions=cpus).count()
        noop.append(time.time() - t0)
    spark_job_ms = round(statistics.median(noop) * 1000, 1)

    print(
        json.dumps(
            {
                "metric": "e2e_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": cpus,
                "pipeline": pipeline,
                "calibration": {
                    "cpu_mops": cpu_mops,
                    "spark_job_ms": spark_job_ms,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
