"""Deployment helpers: ship this package to executors.

The north_rule deployment is ``spark-submit --py-files engine.zip`` on a
multi-executor cluster. For driver-only setups (notebooks, embedded
sessions) :func:`ship_package` reproduces that: zip the package and
``addPyFile`` it, so Python workers can unpickle UDF closures that
reference these modules. Without either, every pandas UDF dies with
``ModuleNotFoundError`` on the workers (only the driver saw ``sys.path``).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_ROOT = os.path.dirname(os.path.abspath(__file__))


def build_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the package for ``spark-submit --py-files``; returns the path."""
    out = out_path or os.path.join(
        tempfile.gettempdir(), "xrpl_rich_list_py_crawler_spark.zip"
    )
    pkg_name = os.path.basename(_PKG_ROOT)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(_PKG_ROOT):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(pkg_name, os.path.relpath(full, _PKG_ROOT))
                z.write(full, rel)
    return out


def ship_package(spark: SparkSession, out_path: str | None = None) -> str:
    """Make this package importable on every Python worker of ``spark``."""
    zpath = build_pyfiles_zip(out_path)
    spark.sparkContext.addPyFile(zpath)
    return zpath
