"""Package the engine for cluster submission: build a deterministic
``dist/s_crawler_spark.zip`` suitable for ``spark-submit --py-files``
(north rule: "run via spark-submit --py-files on multi-executor clusters").

    python tools/package_pyfiles.py [out.zip]
    spark-submit --py-files dist/s_crawler_spark.zip your_driver.py

The zip is importable directly (zipimport): executors resolve
``s_crawler_spark.*`` — including the modules whose functions ride inside
pandas-UDF closures, which cloudpickle serializes BY REFERENCE and re-imports
on the worker — from the shipped archive. Deterministic output (sorted
entries, fixed timestamps, source files only) so re-packaging an unchanged
tree is byte-identical: cluster-side caches and content-addressed stores
see one artifact per code state.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "s_crawler_spark"


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO_ROOT, "dist", f"{PACKAGE}.zip")
    out_dir = os.path.dirname(out)
    if out_dir:  # bare filename → cwd, makedirs("") raises
        os.makedirs(out_dir, exist_ok=True)
    pkg_root = os.path.join(REPO_ROOT, PACKAGE)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(dirpath, fn)
                arcname = os.path.relpath(path, REPO_ROOT)
                # ZipInfo's default date_time (1980-01-01) keeps the archive
                # independent of file mtimes
                info = zipfile.ZipInfo(arcname)
                info.compress_type = zipfile.ZIP_DEFLATED
                with open(path, "rb") as f:
                    z.writestr(info, f.read())
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
    print(f"spark-submit --py-files {path} your_driver.py")
