"""SparkSession factory tuned for the KG-construction workload.

Design notes (scale target: 10^12-row web-page table, 1000-executor
cluster; sandbox proxy: local[8]/local[32]):

- AQE on everywhere: runtime coalescing of the many small post-shuffle
  partitions at test scale, skew-join splitting at web scale (head
  entities / head hosts are Zipfian).
- Arrow enabled for the pandas-UDF extraction seams; batch size kept
  moderate because each row can carry a multi-KB html payload.
- ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a real cluster this is overridden (or left to AQE's
  coalescePartitions with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with the engine's standard conf."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if "PYSPARK_GATEWAY_PORT" in os.environ:
        # Launched by spark-submit: the JVM gateway already carries the
        # --master the user chose; setting builder.master here would
        # silently override `spark-submit --master yarn` with local[N].
        # Only an explicit function argument may still do that — the
        # KGSPARK_MASTER env var must not outrank the --master flag.
        if master is None and os.environ.get("KGSPARK_MASTER"):
            import warnings

            warnings.warn(
                "KGSPARK_MASTER ignored under spark-submit; "
                "use spark-submit --master instead",
                stacklevel=2,
            )
    else:
        master = master or os.environ.get("KGSPARK_MASTER") or f"local[{cpus}]"
    if shuffle_partitions is None:
        if master is None:
            shuffle_partitions = 200
        elif master.startswith("local["):
            # local[N] or local[N,maxFailures] — only N sizes shuffles
            inner = master[len("local[") : -1].split(",")[0]
            shuffle_partitions = 32 if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200

    # shuffle/spill on tmpfs when available: the sandbox's virtio disk
    # (~370 MB/s) would serialize every shuffle-bound stage; a real
    # cluster provisions local NVMe for exactly this reason
    local_dir = os.environ.get("KGSPARK_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/kgspark-local"

    # Whole-stage codegen emits one Java method per operator pipeline;
    # wide generated methods (e.g. the 64-partial-sum simhash aggregate,
    # operators/dedup.py) can exceed HotSpot's 8 KB bytecode JIT cap
    # and fall back to the bytecode interpreter. Lifting
    # DontCompileHugeMethods lets C2 compile them (simhash pair stage
    # A/B at sf1.0: 5.5 s vs 6.1 s); on a cluster the same flag goes on
    # the executors (set below; in local mode the driver JVM is the
    # executor). Standard Spark codegen tuning. NOTE: the flag is a
    # mitigation, not a license for giant expressions — a 64-term
    # unrolled dot chain still measured far slower than the compact HOF
    # dot (see the A/B note in operators/similarity.py).
    jit_flags = "-XX:-DontCompileHugeMethods"

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.extraJavaOptions", jit_flags)
        .config("spark.executor.extraJavaOptions", jit_flags)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("KGSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    if master is not None:
        builder = builder.master(master)
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
