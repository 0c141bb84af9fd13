"""Extra benchmarks for optimization work (guide §1.4): per-query
isolation with the noop sink, plan capture, and arbitrary SF dirs.

bench.py is the frozen driver contract; this file exists so the round's
before/after numbers can be produced without touching it.

Usage:
    python bench_extra.py [--sf-dir DIR] [--runs N] [--queries a,b,c]
        [--noop] [--explain-dir plans/r06] [--suffix _before]

With --noop the query is evaluated via df.write.format("noop") (every
column of every row computed, no sink cost); default is bench.py's
force() hash so numbers are directly comparable to the driver bench.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def force(df: DataFrame) -> int:
    row = df.select(
        F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
    ).agg(F.count("*").alias("n"), F.bit_xor("h")).first()
    return row["n"]


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    from kgspark.entrypoints import QUERIES
    from kgspark.runtime import release_materialized
    from kgspark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("kgspark-bench-extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    names = [q.strip() for q in args.queries.split(",") if q.strip()] or list(QUERIES)
    evaluate = noop if args.noop else force

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
            release_materialized()

    # warm pass (untimed): codegen, parquet footers, python workers
    for name in names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        evaluate(QUERIES[name](spark, args.sf_dir))
        release_materialized()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.runs):
        for name in names:
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.time()
            evaluate(QUERIES[name](spark, args.sf_dir))
            samples[name].append(round(time.time() - t0, 3))
            release_materialized()

    out = {
        "sf_dir": args.sf_dir,
        "cpus": cpus,
        "mode": "noop" if args.noop else "force",
        "queries": {n: round(statistics.median(samples[n]), 3) for n in names},
        "samples": samples,
        "total": round(sum(statistics.median(samples[n]) for n in names), 3),
    }
    line = json.dumps(out)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
