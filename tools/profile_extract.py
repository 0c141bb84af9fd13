"""Extract-stage scaling profiler (development tool).

Isolates the extraction stage on a materialized corpus and measures its
wall time at two parallelism levels under different knob settings, to
attribute the stage's scaling gap (Arrow batch size, input splits,
JVM-vs-Python split).

Usage: python tools/profile_extract.py [n_pages replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(cpus: int, src: str, batch: int) -> None:
    import time

    from kgspark.extract.ner import extract_facts
    from kgspark.session import get_spark

    spark = get_spark(
        f"extract-prof-{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": str(batch)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(f"{src}/webpages")
    t0 = time.time()
    n = extract_facts(pages).count()
    wall = time.time() - t0
    print(json.dumps({"cpus": cpus, "batch": batch, "facts": n, "sec": round(wall, 2)}))
    spark.stop()


def main() -> None:
    if sys.argv[1:2] == ["--run"]:
        run_leg(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
        return

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 96

    from pyspark.sql import functions as F

    from kgspark import datagen
    from kgspark.session import get_spark

    root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="extract-prof-", dir=root)
    src = f"{base}/src"
    spark = get_spark("extract-prof-gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = datagen.generate_corpus(n_pages=n_pages, seed=13, facts_range=(6, 12), filler_paras=8)
    pages, _, _ = datagen.corpus_to_spark(spark, corpus)
    reps = spark.range(replicate).select(F.col("id").alias("rep"))
    pages = (
        pages.crossJoin(reps)
        .withColumn("url", F.concat(F.col("url"), F.lit("?rep="), F.col("rep")))
        .drop("rep")
    )
    pages.repartition(256).write.mode("overwrite").parquet(f"{src}/webpages")
    spark.stop()

    try:
        for batch in (4096, 32768):
            for cpus in (2, 8):
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--run",
                     str(cpus), src, str(batch)],
                    check=True,
                )
    finally:
        import shutil

        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
