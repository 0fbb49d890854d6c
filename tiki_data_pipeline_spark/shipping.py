"""Ship this package to Spark workers.

Pandas UDFs defined at module level (functions/urls.py,
functions/text.py) are cloudpickled BY REFERENCE — the worker
deserializer must be able to ``import tiki_data_pipeline_spark``.
That only works by accident when the driver process happens to run
with the repo as its cwd. ``ensure_shipped`` zips the package and
``sc.addPyFile``s it once per SparkContext, which puts it on every
worker's sys.path regardless of where the driver was launched.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    tmp = tempfile.mkdtemp(prefix="tiki_spark_pkg_")
    zip_path = os.path.join(tmp, "tiki_data_pipeline_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, parent))
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)
