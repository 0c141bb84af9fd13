"""CSV fact-table scan with a stable source-order column (SURVEY.md A1).

The reference iterates ``csv.DictReader`` rows in file order
(build_rdf.py:154-156); first-wins attribute semantics depend on that
order, so the scan must attach a deterministic ``row_idx``.

Contract at scale: a 10^12-row source should carry an explicit sequence
column written at ingest time (our datagen does). For ad-hoc CSV
fixtures we derive one: ``monotonically_increasing_id`` is
(partition_index << 33) | row_in_partition, and Spark assigns partition
indexes to a single file's splits in offset order, so ranking by it
within a file reproduces file order. This is NOT stable across runs for
multi-file globs with changing listings — hence the ingest-time-column
contract for production tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_fact_csv(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.option("header", True).csv(path)
    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    return df.withColumn("row_idx", F.row_number().over(w).cast("long"))
