"""spark-submit application entry for the KG-construction pipeline.

The production invocation shape (north rule: "run via spark-submit
--py-files on a multi-executor cluster"):

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/kgspark.zip \
        tools/submit_job.py pipeline --src <dir> --out <dir> \
        --snapshot <id>

``kgspark`` is imported lazily inside main() so the import genuinely
resolves from the --py-files zip on driver and executors (this file
carries no package code). Prints exactly one JSON metrics line on
stdout; everything else goes to stderr.

Give driver JVM sizing as spark-submit flags (``--driver-memory 8g``):
builder-time ``spark.driver.memory`` is ignored under spark-submit
because the JVM is already running, and in local mode the executors
share that heap.

Subcommands:
  pipeline  — full doc→KG run (extract, link, triples, graph) from a
              corpus dir written by kgspark.datagen (webpages/aliases/
              canonicals parquet), writing bucketed, resumable outputs.
  query     — run one named engine query (the registry behind
              __spark_entry__.queries()) against an sf data dir and
              print row count + first rows: the batch analog of the
              reference's CLI runner (scripts/run_cypher_rag.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("pipeline")
    p.add_argument("--src", required=True, help="corpus dir (webpages/aliases/canonicals)")
    p.add_argument("--out", required=True, help="output table root")
    p.add_argument("--snapshot", required=True, help="input snapshot id (lineage)")
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument(
        "--master-hint",
        default=None,
        help="optional master override; under spark-submit the --master "
        "flag is respected automatically, so this is only needed when "
        "running as plain python (no gateway)",
    )
    p.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="pin spark.sql.shuffle.partitions (the scaling bench fixes "
        "this across legs so parallelism is the ONLY controlled variable)",
    )
    q = sub.add_parser("query")
    q.add_argument("name", help="query name from the engine registry")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--show", type=int, default=5)
    q.add_argument("--master-hint", default=None)
    q.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from kgspark.session import get_spark

    spark = get_spark(
        "kgspark-submit",
        master=args.master_hint,
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "query":
        from kgspark.entrypoints import QUERIES

        if args.name not in QUERIES:
            print(
                f"unknown query {args.name!r}; known: {sorted(QUERIES)}",
                file=sys.stderr,
            )
            raise SystemExit(2)
        df = QUERIES[args.name](spark, args.sf_dir)
        rows = df.limit(args.show).collect()
        print(json.dumps({
            "cmd": "query",
            "name": args.name,
            "master": spark.sparkContext.master,
            "rows": df.count(),
            "head": [r.asDict(recursive=True) for r in rows],
        }, default=str))
        spark.stop()
        return

    from kgspark.plans.pipeline import run_pipeline

    pages = spark.read.parquet(f"{args.src}/webpages")
    aliases = spark.read.parquet(f"{args.src}/aliases")
    canonicals = spark.read.parquet(f"{args.src}/canonicals")
    n_docs = pages.count()

    t0 = time.time()
    metrics = run_pipeline(
        spark, pages, aliases, args.out, snapshot=args.snapshot,
        canonicals=canonicals, n_buckets=args.n_buckets,
    )
    wall = time.time() - t0
    line = {
        "cmd": "pipeline",
        "master": spark.sparkContext.master,
        "docs": n_docs,
        "triples": metrics["triples"]["rows"],
        "sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1),
        "triples_per_sec": round(metrics["triples"]["rows"] / wall, 1),
        "stage_sec": {
            k: v.get("sec") for k, v in metrics.items() if isinstance(v, dict)
        },
    }
    print(json.dumps(line))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
