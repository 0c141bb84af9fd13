"""Build the --py-files artifact: dist/kgspark.zip.

The north-rule deployment surface is ``spark-submit --py-files`` on a
multi-executor cluster; executors import ``kgspark`` from this zip.
Deterministic output (sorted entries, zeroed timestamps) so repeated
builds don't churn checksums.

Usage: python tools/make_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", "kgspark.zip")
    # dirname is '' for a bare filename — makedirs('') would raise
    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    entries = []
    pkg_root = os.path.join(REPO, "kgspark")
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
