"""Incremental (AvailableNow) ingestion: drain, resume, no double-count."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import datagen
from kgspark.streaming.incremental import incremental_extract


def test_incremental_extract_resumes(spark, tmp_path):
    corpus = datagen.generate_corpus(n_pages=60, seed=21)
    pages, _, _ = datagen.corpus_to_spark(spark, corpus)
    src = str(tmp_path / "webpages")
    out = str(tmp_path / "out")

    first_half = pages.filter(F.col("url").rlike("/page/[0-2][0-9]$|/page/[0-9]$"))
    rest = pages.join(first_half.select("url"), "url", "left_anti")

    first_half.write.mode("append").parquet(src)
    n1 = incremental_extract(spark, src, out, n_buckets=4)
    assert n1 >= 1
    count1 = spark.read.parquet(f"{out}/facts").count()
    assert count1 > 0

    # drain again with no new files: nothing reprocessed
    assert incremental_extract(spark, src, out, n_buckets=4) == 0
    assert spark.read.parquet(f"{out}/facts").count() == count1

    # add the remaining pages: only they are processed
    rest.write.mode("append").parquet(src)
    assert incremental_extract(spark, src, out, n_buckets=4) >= 1
    total = spark.read.parquet(f"{out}/facts").count()

    # equivalence with a one-shot batch extraction over everything
    from kgspark.extract.ner import extract_facts

    batch = extract_facts(spark.read.parquet(src))
    assert total == batch.count()


def test_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState exact dedup: duplicates dropped within a
    drain AND across drains (state survives via the checkpoint)."""
    from kgspark.streaming.incremental import incremental_dedup

    corpus = datagen.generate_corpus(n_pages=40, seed=33)
    pages, _, _ = datagen.corpus_to_spark(spark, corpus)
    src = str(tmp_path / "pages")
    out = str(tmp_path / "dedup")

    # first drain: originals + exact duplicates under different urls
    dups = pages.limit(10).withColumn("url", F.concat(F.col("url"), F.lit("?dup")))
    pages.unionByName(dups).write.mode("append").parquet(src)
    assert incremental_dedup(spark, src, out) >= 1
    keep1 = spark.read.parquet(f"{out}/keep")
    n_distinct = keep1.select("fingerprint").distinct().count()
    assert keep1.count() == n_distinct == 40  # dups collapsed in-batch

    # second drain: re-send 10 more duplicates of already-seen content —
    # cross-batch state drops ALL of them
    dups2 = pages.limit(10).withColumn("url", F.concat(F.col("url"), F.lit("?dup2")))
    dups2.write.mode("append").parquet(src)
    incremental_dedup(spark, src, out)
    keep2 = spark.read.parquet(f"{out}/keep")
    assert keep2.count() == 40
    assert keep2.select("fingerprint").distinct().count() == 40
