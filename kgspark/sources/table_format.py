"""TableFormat seam: the snapshot/lineage contract the pipeline codes to.

The engine's stages (plans/pipeline.py, streaming/incremental.py) never
touch manifest files directly — they call this three-method interface,
for which two implementations make sense:

- ``ManifestTableFormat`` (here, the default): Parquet directories plus
  the ``_manifests/<stage>.json`` sidecars of sources/manifests.py —
  what this sandbox can run (no Iceberg jars available).
- a future ``IcebergTableFormat``: the same calls map 1:1 onto an
  Iceberg catalog —

  ===================  ====================================================
  seam call            Iceberg equivalent
  ===================  ====================================================
  ``read_snapshot``    ``table.currentSnapshot()`` summary (snapshot id,
                       committed partition set, row counts live in the
                       snapshot's summary properties / partition stats)
  ``pending_buckets``  committed-partition diff: buckets whose data files
                       are not reachable from the current snapshot's
                       manifest list for this input snapshot id
  ``commit_snapshot``  one atomic commit — ``overwritePartitions`` (bucket
                       increments) or ``replaceTable`` (whole-stage
                       results), stamping the input snapshot id and row
                       counts into the snapshot summary
  ===================  ====================================================

  Data writes themselves go through ``df.writeTo(table)`` instead of
  ``df.write.parquet(dir)``; the resume/idempotence logic above the seam
  is unchanged because both implementations give the same guarantee:
  a commit is atomic and a stage's snapshot id is readable afterwards.

The guarantee set is executable: tests/test_table_format.py is a
parametrized conformance suite (atomic commit under a torn publish,
idempotent bucket re-commit, reserved-key protection, summary
carry-forward, pending-bucket diff semantics, per-stage independence)
that any implementation added to its ``FORMATS`` list must pass —
the acceptance gate for a future ``IcebergTableFormat``.
"""

from __future__ import annotations

from typing import Any

from kgspark.sources import manifests


class TableFormat:
    """Snapshot/lineage contract (see module docstring)."""

    def read_snapshot(self, out_dir: str, stage: str) -> dict | None:
        """The stage's committed snapshot metadata, or None."""
        raise NotImplementedError

    def pending_buckets(
        self, out_dir: str, stage: str, snapshot: str, all_buckets: list[int]
    ) -> list[int]:
        """Buckets not yet committed for this (stage, input snapshot)."""
        raise NotImplementedError

    def commit_snapshot(
        self,
        out_dir: str,
        stage: str,
        snapshot: str,
        bucket_rows: dict[int, int] | None = None,
        summary: dict[str, Any] | None = None,
    ) -> None:
        """Atomically commit stage progress: either a bucket increment
        (``bucket_rows``: merged into the stage's committed bucket set)
        or a whole-stage result (``summary``: row counts / conf stamped
        on the snapshot)."""
        raise NotImplementedError


class ManifestTableFormat(TableFormat):
    """Parquet + JSON-sidecar implementation (sources/manifests.py)."""

    def read_snapshot(self, out_dir: str, stage: str) -> dict | None:
        return manifests.read_manifest(out_dir, stage)

    def pending_buckets(
        self, out_dir: str, stage: str, snapshot: str, all_buckets: list[int]
    ) -> list[int]:
        return manifests.pending_buckets(out_dir, stage, snapshot, all_buckets)

    def commit_snapshot(
        self,
        out_dir: str,
        stage: str,
        snapshot: str,
        bucket_rows: dict[int, int] | None = None,
        summary: dict[str, Any] | None = None,
    ) -> None:
        if bucket_rows is not None:
            # forward ALL summary keys, not just conf — a commit that
            # stamps e.g. row totals alongside a bucket increment must
            # not silently lose them
            s = dict(summary or {})
            manifests.record_buckets(
                out_dir, stage, snapshot, bucket_rows,
                s.pop("conf", None), extra=s,
            )
            return
        manifests.write_manifest(
            out_dir,
            stage,
            {"stage": stage, "snapshot": snapshot, **(summary or {})},
        )


DEFAULT_FORMAT = ManifestTableFormat()
