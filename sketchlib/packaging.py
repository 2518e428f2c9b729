"""Packaging for spark-submit --py-files and for shipping the library to
python workers when the driver wasn't started from the repo root."""

from __future__ import annotations

import os
import zipfile

__all__ = ["make_pyfiles_zip", "ensure_shipped"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the sketchlib package for --py-files / addPyFile.  The default
    name is per-process: a shared fixed path lets a concurrent Spark JVM
    observe the file changing mid-fetch (executor 'SparkEnv.get() is null'
    fetch failures)."""
    out_path = out_path or os.path.join(
        "/tmp", f"sketchlib_pyfiles_{os.getpid()}.zip")
    pkg_dir = os.path.join(_REPO_ROOT, "sketchlib")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, _REPO_ROOT)
                zf.write(full, rel)
    return out_path


_shipped: set[int] = set()


def ensure_shipped(spark) -> None:
    """Make sketchlib importable on python workers regardless of the
    driver's cwd: addPyFile a freshly-built zip, once per SparkContext."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    try:
        sc.addPyFile(make_pyfiles_zip())
    except Exception:
        pass  # already added with the same name, or local path on sys.path
    _shipped.add(key)
