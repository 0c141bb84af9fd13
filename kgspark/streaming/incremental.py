"""Incremental (streaming) ingestion of the web-page table.

The reference has NO streaming surface (SURVEY.md §2: verified — no
watermarks/windows/state anywhere in /root/reference). What the
north_rule *does* require is idempotent resumability; this module is
the Structured-Streaming expression of the same contract:

    readStream(parquet dir) → Trigger.AvailableNow → foreachBatch:
        extract facts → append to the facts table, recording the batch
        in the same manifest layer the batch pipeline reads.

``availableNow`` drains whatever files exist and stops, so repeated
invocations pick up only NEW files (checkpointed source offsets) —
the streaming twin of the batch pipeline's bucket-level resume. The
downstream stages (link → triples → graph) are then run by the batch
pipeline on the refreshed facts table; they are snapshot-keyed, so a
new snapshot id triggers their rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark.datagen import WEBPAGE_SCHEMA
from kgspark.extract.ner import extract_facts
from kgspark.plans.pipeline import bucket_col
from kgspark.sources import manifests


def incremental_extract(
    spark: SparkSession,
    webpages_dir: str,
    out_dir: str,
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
) -> int:
    """Drain all currently-available page files into the facts table.

    Returns the number of micro-batches processed. Safe to call
    repeatedly; source offsets live in ``{out_dir}/_checkpoints``.
    """
    stream = (
        spark.readStream.schema(WEBPAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 64)
        .parquet(webpages_dir)
    )

    batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        facts = extract_facts(
            batch_df.select("url", "warc_ts", "html", "text", "lang")
        ).withColumn("bucket", bucket_col(F.col("url"), n_buckets))
        facts.write.mode("append").partitionBy("bucket").parquet(f"{out_dir}/facts")
        manifests.record_buckets(
            out_dir,
            "stream_extract",
            "streaming",
            {-1: batch_id},  # batch ledger; bucket-granular counts live in batch mode
            {"n_buckets": n_buckets, "last_batch_id": batch_id},
        )
        batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{out_dir}/_checkpoints/extract")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]
