"""TableFormat conformance suite (kgspark/sources/table_format.py).

Parametrized over implementations: every TableFormat the pipeline can
run on MUST pass these — they are the guarantees plans/pipeline.py and
streaming/incremental.py assume when they resume from a snapshot. A
future ``IcebergTableFormat`` registers itself in ``FORMATS`` and gets
the whole contract checked (atomic commit, idempotent re-commit,
summary/reserved-key rules, pending-bucket diff semantics) with no new
test code.

No SparkSession involved: the seam is metadata-only by design (data
writes go through the normal DataFrame writers above it).
"""

from __future__ import annotations

import json
import os

import pytest

from kgspark.sources.table_format import ManifestTableFormat, TableFormat

FORMATS: list[tuple[str, type[TableFormat]]] = [
    ("manifest", ManifestTableFormat),
]


@pytest.fixture(params=FORMATS, ids=[n for n, _ in FORMATS])
def fmt(request):
    return request.param[1]()


def test_read_snapshot_none_before_any_commit(fmt, tmp_path):
    assert fmt.read_snapshot(str(tmp_path), "extract") is None


def test_whole_stage_commit_round_trips_summary(fmt, tmp_path):
    out = str(tmp_path)
    fmt.commit_snapshot(out, "extract", "snap-1", summary={"rows": 42, "conf": {"k": 1}})
    m = fmt.read_snapshot(out, "extract")
    assert m is not None
    assert m["stage"] == "extract"
    assert m["snapshot"] == "snap-1"
    assert m["rows"] == 42
    assert m["conf"] == {"k": 1}


def test_pending_buckets_full_list_without_manifest(fmt, tmp_path):
    out = str(tmp_path)
    assert fmt.pending_buckets(out, "triples", "snap-1", [0, 1, 2]) == [0, 1, 2]


def test_pending_buckets_diff_and_snapshot_reset(fmt, tmp_path):
    out = str(tmp_path)
    fmt.commit_snapshot(out, "triples", "snap-1", bucket_rows={0: 10, 2: 5})
    # diff: only uncommitted buckets remain, order preserved
    assert fmt.pending_buckets(out, "triples", "snap-1", [0, 1, 2, 3]) == [1, 3]
    # a NEW input snapshot invalidates all prior progress
    assert fmt.pending_buckets(out, "triples", "snap-2", [0, 1, 2, 3]) == [0, 1, 2, 3]


def test_bucket_commits_accumulate(fmt, tmp_path):
    out = str(tmp_path)
    fmt.commit_snapshot(out, "triples", "snap-1", bucket_rows={0: 10})
    fmt.commit_snapshot(out, "triples", "snap-1", bucket_rows={1: 7})
    assert fmt.pending_buckets(out, "triples", "snap-1", [0, 1, 2]) == [2]
    m = fmt.read_snapshot(out, "triples")
    assert m["rows"] == {"0": 10, "1": 7} or m["rows"] == {0: 10, 1: 7}


def test_bucket_recommit_is_idempotent(fmt, tmp_path):
    out = str(tmp_path)
    fmt.commit_snapshot(out, "triples", "snap-1", bucket_rows={0: 10, 1: 7})
    before = fmt.read_snapshot(out, "triples")
    # a retried task re-commits bucket 1 with the same counts — the
    # committed state must not change (resume safety after a crash
    # between data write and manifest ack)
    fmt.commit_snapshot(out, "triples", "snap-1", bucket_rows={1: 7})
    assert fmt.read_snapshot(out, "triples") == before
    assert fmt.pending_buckets(out, "triples", "snap-1", [0, 1, 2]) == [2]


def test_summary_keys_survive_bucket_only_commits(fmt, tmp_path):
    """Non-reserved summary keys stamped by one commit carry forward
    through later bucket-only commits — the manifest 'loses nothing'
    over its life on a snapshot, not per call."""
    out = str(tmp_path)
    fmt.commit_snapshot(
        out, "triples", "snap-1",
        bucket_rows={0: 10},
        summary={"conf": {"n_buckets": 4}, "input_rows": 99},
    )
    fmt.commit_snapshot(out, "triples", "snap-1", bucket_rows={1: 7})
    m = fmt.read_snapshot(out, "triples")
    assert m["conf"] == {"n_buckets": 4}
    assert m["input_rows"] == 99
    assert sorted(m["buckets_done"]) == [0, 1]


def test_reserved_keys_cannot_be_overridden_by_summary(fmt, tmp_path):
    out = str(tmp_path)
    fmt.commit_snapshot(
        out, "triples", "snap-1",
        bucket_rows={0: 10},
        summary={"snapshot": "EVIL", "buckets_done": [9], "rows": {"9": 1}},
    )
    m = fmt.read_snapshot(out, "triples")
    assert m["snapshot"] == "snap-1"
    assert m["buckets_done"] == [0]
    assert m["rows"] == {"0": 10}
    assert fmt.pending_buckets(out, "triples", "snap-1", [0, 9]) == [9]


def test_commit_is_atomic_under_crash_before_publish(fmt, tmp_path):
    """A crash between writing new state and publishing it leaves the
    OLD snapshot readable. For the manifest implementation the publish
    is an os.replace of a sidecar; we simulate the crash by planting
    the torn temp file a died writer would leave and asserting reads
    ignore it."""
    out = str(tmp_path)
    fmt.commit_snapshot(out, "extract", "snap-1", summary={"rows": 42})
    before = fmt.read_snapshot(out, "extract")
    if isinstance(fmt, ManifestTableFormat):
        torn = os.path.join(out, "_manifests", "extract.json.tmp")
        with open(torn, "w", encoding="utf-8") as f:
            f.write('{"stage": "extract", "snapshot": "snap-2", "rows": ')
    assert fmt.read_snapshot(out, "extract") == before
    # and a subsequent real commit still succeeds over the debris
    fmt.commit_snapshot(out, "extract", "snap-2", summary={"rows": 50})
    assert fmt.read_snapshot(out, "extract")["snapshot"] == "snap-2"


def test_manifest_sidecar_is_valid_json(tmp_path):
    """Implementation detail pin for ManifestTableFormat specifically:
    the sidecar is human-readable JSON (ops can inspect lineage with
    cat), published via temp-file + rename."""
    fmt = ManifestTableFormat()
    out = str(tmp_path)
    fmt.commit_snapshot(out, "graph", "snap-1", summary={"rows": 1})
    path = os.path.join(out, "_manifests", "graph.json")
    with open(path, encoding="utf-8") as f:
        m = json.load(f)
    assert m["snapshot"] == "snap-1"


def test_stages_are_independent(fmt, tmp_path):
    out = str(tmp_path)
    fmt.commit_snapshot(out, "extract", "snap-A", summary={"rows": 1})
    fmt.commit_snapshot(out, "triples", "snap-B", bucket_rows={0: 2})
    assert fmt.read_snapshot(out, "extract")["snapshot"] == "snap-A"
    assert fmt.read_snapshot(out, "triples")["snapshot"] == "snap-B"
    assert fmt.pending_buckets(out, "extract", "snap-A", [0]) == [0]
