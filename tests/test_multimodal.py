"""Multimodal plumbing: schema, batch shape, pruning-friendly plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgspark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthesize_media(spark, n=60).cache()


def test_schema_and_payload_roundtrip(media):
    assert dict(media.dtypes)["payload"] == "binary"
    r = media.filter(F.col("media_id") == 3).first()
    assert r.payload[:4] == b"KGSM" and r.n_bytes == len(r.payload)


def test_decode_featurize_batchflow(spark, media):
    out = mm.decode_and_featurize(media).collect()
    assert len(out) == 60
    by_id = {r.media_id: r for r in out}
    src = {r.media_id: r for r in media.collect()}
    for i, r in by_id.items():
        assert r.decoded_width == src[i].width
        assert r.decoded_height == src[i].height
        assert r.decoded_duration_ms == src[i].duration_ms
        assert len(r.features) == 8
        assert abs(sum(r.features) - 1.0) < 1e-3
        assert r.batch_rows >= 1
    # determinism
    again = {r.media_id: r.features for r in mm.decode_and_featurize(media).collect()}
    assert again == {i: r.features for i, r in by_id.items()}


def test_real_decoder_is_explicit_stub(media):
    with pytest.raises(NotImplementedError, match="pil"):
        mm.decode_and_featurize(media, decoder="pil")


def test_resize_plan_math_and_pruning(spark, media, tmp_path):
    plan = mm.resize_plan(media, max_side=100)
    for r in plan.collect():
        if max(r.width, r.height) > 100:
            assert max(r.target_width, r.target_height) == 100
        else:
            assert (r.target_width, r.target_height) == (r.width, r.height)
    # payload must be pruned out of the parquet scan for metadata-only plans
    path = str(tmp_path / "media")
    media.write.mode("overwrite").parquet(path)
    disk_plan = mm.resize_plan(spark.read.parquet(path), max_side=100)
    physical = disk_plan._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in physical.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("payload" not in ln for ln in read_schema), physical


def test_frame_sampling(media):
    frames = mm.frame_sample_plan(media, every_ms=500)
    rows = frames.collect()
    assert rows and all(r.frame_ts_ms % 500 == 0 for r in rows)
    one = [r.frame_ts_ms for r in rows if r.media_id == 2]
    dur = 1000 + 2 * 250
    assert one == list(range(0, dur, 500))


def test_media_stats(media):
    got = {r.kind: r.n for r in mm.media_stats(media).collect()}
    assert got == {"image": 20, "audio": 20, "video": 20}


def test_frame_sample_skips_zero_duration_video(spark):
    """A zero/NULL-duration video row must yield no frames, not an
    illegal-sequence crash of the whole job."""
    from kgspark.operators.multimodal import frame_sample_plan

    media = spark.createDataFrame(
        [(1, "video", 2500), (2, "video", 0), (3, "video", None), (4, "image", 0)],
        "media_id long, kind string, duration_ms int",
    )
    got = {(r.media_id, r.frame_ts_ms) for r in frame_sample_plan(media).collect()}
    assert got == {(1, 0), (1, 1000), (1, 2000)}
