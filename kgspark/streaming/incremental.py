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

from pyspark.sql import Column, DataFrame, SparkSession
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


def streaming_exact_dedup(
    pages: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    html_col: str | None = "html",
) -> DataFrame:
    """Stateful cross-batch exact dedup for a streaming page source.

    ``applyInPandasWithState`` keyed by the content fingerprint: the
    first arrival of each fingerprint passes through, every later
    arrival (same batch or any later batch — state is checkpointed)
    is dropped. This is the streaming twin of ``dedup.exact_dedup``:
    the keep-row choice is arrival order (streaming has no global
    min-id), which is the semantics an ingest pipeline wants.

    State per key is one boolean — at 10^12 docs the state store holds
    one entry per DISTINCT content, uniformly hash-partitioned by the
    fingerprint, and never rescans history.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # content key: pre-extracted text when present, else the raw html
    # bytes (only if the frame has that column), else the id itself
    # (never a shared null/'' bucket)
    parts = [F.nullif(F.col(text_col), F.lit(""))]
    if html_col and html_col in pages.columns:
        parts.append(F.col(html_col).cast("string"))
    parts.append(F.col(id_col))
    content = F.coalesce(*parts)
    from kgspark.operators.dedup import normalize_text_col

    src = pages.select(
        F.md5(normalize_text_col(content).cast("binary")).alias("fingerprint"),
        F.col(id_col).alias("doc_ref"),
    )

    def keep_first(key, batches, state: "GroupState"):
        import pandas as pd

        if state.exists:
            # fingerprint already seen in an earlier batch: drop all
            for _ in batches:
                pass
            return
        first = None
        for pdf in batches:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]]
        state.update((True,))
        if first is not None:
            yield pd.DataFrame(
                {"fingerprint": [key[0]], "doc_ref": [first["doc_ref"].iloc[0]]}
            )

    return src.groupBy("fingerprint").applyInPandasWithState(
        keep_first,
        outputStructType="fingerprint string, doc_ref string",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    window_dur: str = "1 hour",
    watermark: str = "1 hour",
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Event-time tumbling-window counts per key, watermark-bounded.

    The one brief-required streaming shape the module lacked:
    ``withWatermark`` + ``F.window`` grouped aggregation. Late rows
    (event time older than ``max(event time) - watermark``) are
    dropped before aggregation; in append mode a window is emitted
    exactly once, when the watermark passes its end — so downstream
    sinks see each finalized window a single time.

    Works identically on a batch frame (watermark is a no-op there,
    every window is "final"), which is what lets the DuckDB
    ``time_bucket`` oracle check the aggregation semantics while the
    streaming test checks the watermark semantics.

    State at 10^12 docs: one row per (open window × key), hash-
    partitioned by the group key; the watermark bounds open windows to
    ``watermark/window_dur + 1`` per key, so state size is O(keys),
    never O(events).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window_dur).alias("win"),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n_events"), *(extra_aggs or []))
        .withColumn("win_start", F.col("win.start"))
        .drop("win")
    )


def url_host_col(url: Column) -> Column:
    """scheme://HOST/... → host (the north_rule's skew/partition key)."""
    return F.parse_url(url, F.lit("HOST"))


def incremental_host_counts(
    spark: SparkSession,
    webpages_dir: str,
    out_dir: str,
    window_dur: str = "1 hour",
    watermark: str = "1 hour",
) -> int:
    """Drain available page files into per-(hour, url-host) ingest
    counts. Append mode: each finalized window lands in the parquet
    sink exactly once; rows later than the checkpointed watermark are
    dropped. Returns micro-batches processed this invocation."""
    stream = (
        spark.readStream.schema(WEBPAGE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(webpages_dir)
    )
    counts = windowed_counts(
        stream.select(
            F.col("warc_ts"), url_host_col(F.col("url")).alias("host")
        ),
        "warc_ts",
        "host",
        window_dur,
        watermark,
    )
    batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(f"{out_dir}/host_counts")
        batches["n"] += 1

    q = (
        counts.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", f"{out_dir}/_checkpoints/host_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]


def incremental_dedup(
    spark: SparkSession,
    webpages_dir: str,
    out_dir: str,
) -> int:
    """Drain available page files through the stateful dedup into a
    keep-list table; state (and source offsets) live in the checkpoint,
    so re-invocations dedup against everything already seen."""
    stream = (
        spark.readStream.schema(WEBPAGE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(webpages_dir)
    )
    deduped = streaming_exact_dedup(stream)
    batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(f"{out_dir}/keep")
        batches["n"] += 1

    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{out_dir}/_checkpoints/dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]
