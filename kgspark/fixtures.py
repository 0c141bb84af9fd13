"""Oracle-visible parquet fixture for the end-to-end pipeline slice.

The ``kg_pipeline_triples`` driver query runs the full pages →
extraction → linking → triples slice (the reference's EP3
``create_graph_from_documents``, graph_utils.py:100-136). For the
DuckDB oracle to value-check it, the corpus must live somewhere DuckDB
can read — so the deterministic ``datagen`` corpus is materialized once
as parquet files under the repo (pure pyarrow, no Spark session):

- ``webpages.parquet``   — the BASELINE.json input_hint table
  (url, warc_ts, html, text, lang); ``text`` is NULL for half the rows
  (the html-decode path must fill it in);
- ``page_texts.parquet`` — (url, text): the single-process reference
  extractor's output for EVERY page. This is the north-rule's
  "byte-identical extracted text per url" invariant in table form: the
  oracle consumes it directly, so if the distributed mapInArrow decode
  ever diverged from the spec extractor, the downstream triples would
  hash-mismatch;
- ``aliases.parquet`` / ``canonicals.parquet`` — the linking dimensions.

Regeneration is automatic (and atomic) whenever the generator inputs
change: the meta stamp hashes datagen.py + extract/html.py sources, so
a semantic change to the corpus or the extractor invalidates the
fixture instead of silently serving stale bytes.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

PIPELINE_N_PAGES = 200
PIPELINE_SEED = 31
_FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".fixtures")
PIPELINE_FIXTURE_DIR = os.path.join(_FIXTURE_ROOT, "pipeline")


def _meta_stamp() -> dict:
    import kgspark.datagen as dg
    import kgspark.extract.html as hx

    h = hashlib.sha256()
    for mod in (dg, hx):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    return {
        "n_pages": PIPELINE_N_PAGES,
        "seed": PIPELINE_SEED,
        "source_sha": h.hexdigest(),
    }


def ensure_pipeline_fixture() -> str:
    """Write the fixture if missing/stale; return its directory."""
    meta = _meta_stamp()
    meta_path = os.path.join(PIPELINE_FIXTURE_DIR, "_meta.json")
    try:
        with open(meta_path) as f:
            if json.load(f) == meta:
                return PIPELINE_FIXTURE_DIR
    except (OSError, ValueError):
        pass

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgspark import datagen

    corpus = datagen.generate_corpus(
        n_pages=PIPELINE_N_PAGES, seed=PIPELINE_SEED
    )
    tmp = PIPELINE_FIXTURE_DIR + f".tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)

    urls, tss, htmls, texts, langs = zip(*corpus.pages)
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        ),
        os.path.join(tmp, "webpages.parquet"),
    )
    gt = sorted(corpus.page_texts.items())
    pq.write_table(
        pa.table(
            {
                "url": pa.array([u for u, _ in gt], pa.string()),
                "text": pa.array([t for _, t in gt], pa.string()),
            }
        ),
        os.path.join(tmp, "page_texts.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "alias": pa.array([a for a, _ in corpus.aliases], pa.string()),
                "canonical": pa.array([c for _, c in corpus.aliases], pa.string()),
            }
        ),
        os.path.join(tmp, "aliases.parquet"),
    )
    pq.write_table(
        pa.table({"canonical": pa.array(corpus.providers, pa.string())}),
        os.path.join(tmp, "canonicals.parquet"),
    )
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump(meta, f)

    # Near-atomic publish under concurrency (parallel pytest workers /
    # driver + test runs can regenerate simultaneously): rename the old
    # fixture ASIDE, swap the new one in, then delete the old — readers
    # see a missing dir only between two rename syscalls, not for the
    # whole rmtree+rebuild. If another process won the race (rename
    # fails because its fresh fixture now occupies the target), adopt
    # its copy and discard ours — the stamp check proves equivalence.
    trash = PIPELINE_FIXTURE_DIR + f".old-{os.getpid()}"
    # A crashed prior run with a recycled pid can leave this exact trash
    # dir behind; rename onto a non-empty dir raises ENOTEMPTY, so
    # pre-clean it (mirror of the tmp pre-clean above).
    shutil.rmtree(trash, ignore_errors=True)
    try:
        os.rename(PIPELINE_FIXTURE_DIR, trash)
    except FileNotFoundError:
        pass
    try:
        os.rename(tmp, PIPELINE_FIXTURE_DIR)
    except OSError:
        try:
            with open(meta_path) as f:
                fresh = json.load(f) == meta
        except (OSError, ValueError):
            fresh = False
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        if fresh:
            return PIPELINE_FIXTURE_DIR
        raise
    shutil.rmtree(trash, ignore_errors=True)
    return PIPELINE_FIXTURE_DIR
