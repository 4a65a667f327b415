"""Ship this package to Spark's Python workers.

Python UDFs (pandas UDF / mapInPandas) defined in this package are
cloudpickled *by reference*, so executor-side Python workers must be
able to ``import kafka_s3_etl_spark`` themselves. The driver process
importing the repo by path (as the harness does via __spark_entry__)
does not make that true for workers — neither in local mode nor on a
real cluster.

``ensure_workers_can_import`` zips the package once per process and
registers it with ``SparkContext.addPyFile``, the same mechanism used
to ship dependencies to a 1000-executor cluster. Idempotent and cheap
(~50 KB zip, hashed content name)."""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_kafka_s3_etl_spark_shipped"


def _package_root() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def _build_zip() -> str:
    pkg_root = _package_root()
    parent = os.path.dirname(pkg_root)
    py_files = []
    for dirpath, _dirnames, filenames in os.walk(pkg_root):
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                py_files.append(os.path.join(dirpath, fn))
    digest = hashlib.sha1()
    for p in sorted(py_files):
        digest.update(p.encode())
        with open(p, "rb") as f:
            digest.update(f.read())
    zip_path = os.path.join(
        tempfile.gettempdir(), f"kafka_s3_etl_spark_{digest.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(zip_path):
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for p in sorted(py_files):
                zf.write(p, os.path.relpath(p, parent))
        os.replace(tmp, zip_path)
    return zip_path


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Idempotently make this package importable on executor workers."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    sc.addPyFile(_build_zip())
    setattr(sc, _SHIPPED_ATTR, True)
