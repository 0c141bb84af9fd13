"""Multimodal (image/audio/video) column operators — training-data pipeline.

Media are opaque ``binary`` columns with typed metadata, exactly like
the web-page table's ``html`` column. The Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures, size accounting — is
real and tested; the actual codec work is STUBBED behind
``KGSPARK_MEDIA_DECODER`` because no image/audio libraries exist in
this container:

- ``decoder="stub"`` (default): deterministic fake decode that parses
  our synthetic media header (see ``synthesize_media``) — real batch
  flow, fake pixels;
- ``decoder="pil"``/``"librosa"``: raise NotImplementedError with a
  clear message (the integration point; swap-in is one function).

Scale notes: media rows are huge (MBs) — never let them pass through a
pandas conversion (same lesson as html: Arrow batches keep the payload
in Arrow buffers, rows decoded one at a time inside the batch);
``media_stats``/filter pushdown operate on the *metadata* columns so
Parquet never materializes the payload for pruning-only queries.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (url, kind, media bytes, metadata) — the typed-metadata contract
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string,"
    " width int, height int, duration_ms int, n_bytes long"
)

_MAGIC = b"KGSM"  # synthetic media header: MAGIC kind:1 width:4 height:4 dur:4


def synthesize_media_bytes(kind: str, media_id: int, width: int, height: int, duration_ms: int) -> bytes:
    """Deterministic fake media payload with a parseable header."""
    kind_code = {"image": 1, "audio": 2, "video": 3}[kind]
    header = _MAGIC + struct.pack("<BIII", kind_code, width, height, duration_ms)
    body_len = (media_id * 2654435761) % 4096 + 128
    body = bytes((media_id * 31 + i * 7) % 256 for i in range(body_len))
    return header + body


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table in MEDIA_SCHEMA."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = (64 + (i % 8) * 32, 48 + (i % 5) * 32) if kind != "audio" else (0, 0)
        dur = 0 if kind == "image" else 1000 + i * 250
        payload = synthesize_media_bytes(kind, i, w, h, dur)
        mime = {"image": "image/x-kgsm", "audio": "audio/x-kgsm", "video": "video/x-kgsm"}[kind]
        rows.append((i, kind, payload, mime, w, h, dur, len(payload)))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _decode_stub(payload: bytes) -> dict:
    """Parse the synthetic header; deterministic 8-dim 'feature' vector."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a KGSM payload")
    kind_code, width, height, duration_ms = struct.unpack("<BIII", payload[4:17])
    body = payload[17:]
    feats = [0.0] * 8
    for i, b in enumerate(body):
        feats[i % 8] += b
    total = sum(feats) or 1.0
    # Raw IEEE ratios, no rounding: the sums and total are exact
    # integer-valued doubles, so f/total is a single correctly-rounded
    # division — bit-identical in any engine (this is what lets the
    # DuckDB oracle reproduce the "decode" arithmetic exactly).
    return {
        "decoded_width": width,
        "decoded_height": height,
        "decoded_duration_ms": duration_ms,
        "features": [f / total for f in feats],
    }


def decode_and_featurize(
    media: DataFrame, decoder: str = "stub", batch_hint: int = 16
) -> DataFrame:
    """(media_id, kind, decoded_*, features[8], batch_rows) via mapInArrow.

    ``batch_rows`` records the Arrow batch each row traveled in — it
    makes batch shape observable/testable (media batches must stay
    small; configured via spark.sql.execution.arrow.maxRecordsPerBatch).
    """
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder={decoder!r}: real codecs (PIL/librosa/pyav) are not in "
            "this container; implement _decode_<name> with the same return "
            "contract as _decode_stub and route it here"
        )

    import pyarrow as pa

    out_schema = (
        "media_id long, kind string, decoded_width int, decoded_height int,"
        " decoded_duration_ms int, features array<double>, batch_rows int"
    )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # re-slice to at most batch_hint rows: Arrow's maxRecordsPerBatch
        # (default 10k) sizes batches by ROW count, but media rows carry
        # multi-MB payloads — the hint bounds peak per-batch memory in
        # this worker regardless of the session-wide Arrow setting
        def sliced():
            for rb0 in batches:
                for off in range(0, rb0.num_rows, batch_hint):
                    yield rb0.slice(off, batch_hint)

        for rb in sliced():
            ids = rb.column(rb.schema.get_field_index("media_id")).to_pylist()
            kinds = rb.column(rb.schema.get_field_index("kind")).to_pylist()
            payload_col = rb.column(rb.schema.get_field_index("payload"))
            recs = {k: [] for k in ["media_id", "kind", "decoded_width",
                                    "decoded_height", "decoded_duration_ms",
                                    "features", "batch_rows"]}
            for i in range(rb.num_rows):
                d = _decode_stub(payload_col[i].as_py())
                recs["media_id"].append(ids[i])
                recs["kind"].append(kinds[i])
                recs["decoded_width"].append(d["decoded_width"])
                recs["decoded_height"].append(d["decoded_height"])
                recs["decoded_duration_ms"].append(d["decoded_duration_ms"])
                recs["features"].append(d["features"])
                recs["batch_rows"].append(rb.num_rows)
            yield pa.RecordBatch.from_pydict(
                {
                    "media_id": pa.array(recs["media_id"], pa.int64()),
                    "kind": pa.array(recs["kind"], pa.string()),
                    "decoded_width": pa.array(recs["decoded_width"], pa.int32()),
                    "decoded_height": pa.array(recs["decoded_height"], pa.int32()),
                    "decoded_duration_ms": pa.array(recs["decoded_duration_ms"], pa.int32()),
                    "features": pa.array(recs["features"], pa.list_(pa.float64())),
                    "batch_rows": pa.array(recs["batch_rows"], pa.int32()),
                }
            )

    return media.mapInArrow(run, schema=out_schema)


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Metadata-only resize planning: target dims preserving aspect ratio
    (pure column math — the pixel work happens inside the decode UDF at
    materialize time). Demonstrates pruning: no payload column read."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled timestamp
    (sequence + explode on metadata; decode of the actual frames is the
    stubbed UDF's job)."""
    # duration must be strictly positive: sequence(0, -1) on a
    # zero-duration (or NULL-duration) video row is an illegal range
    # that aborts the whole job — such rows simply have no frames
    vids = media.filter(
        (F.col("kind") == "video") & (F.col("duration_ms") > 0)
    )
    stamps = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    return vids.select(
        "media_id", F.explode(stamps).alias("frame_ts_ms")
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind size/duration stats over metadata only (payload pruned)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("n_bytes"), 2).alias("avg_bytes"),
        F.max("duration_ms").alias("max_duration_ms"),
    )
