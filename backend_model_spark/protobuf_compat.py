"""Make ``google.protobuf`` importable everywhere Spark runs Python.

``transformWithStateInPandas`` (the Spark 4 typed-state streaming API)
speaks a protobuf protocol between the JVM operator and the Python
worker (``pyspark/sql/streaming/proto/StateMessage_pb2.py``), so the
``google.protobuf`` runtime must be importable in BOTH the driver
process and every Python worker. Containers without the protobuf
distribution would otherwise lose the whole API.

This hook prefers a real installation: the vendored minimal runtime
(``backend_model_spark/vendor/google/protobuf``) is only placed on the
path when ``google.protobuf`` is not importable. Worker processes
don't run driver code, so the vendor directory must travel via the
``PYTHONPATH`` environment variable — set here BEFORE the JVM starts
(local-mode Python workers inherit the driver's environment), and
mirrored into ``spark.executorEnv.PYTHONPATH`` by ``session.get_spark``
for cluster deployments.
"""

from __future__ import annotations

import importlib.util
import os
import sys

VENDOR_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "vendor")


def ensure_protobuf() -> bool:
    """Return True if ``google.protobuf`` is importable (really
    installed, or via the vendored minimal runtime after this call)."""
    def _findable() -> bool:
        try:  # find_spec raises when the parent 'google' package is absent
            return importlib.util.find_spec("google.protobuf") is not None
        except ModuleNotFoundError:
            return False

    if _findable():
        return True
    if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
        return False
    if VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    parts = os.environ.get("PYTHONPATH", "")
    if VENDOR_DIR not in parts.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            VENDOR_DIR + (os.pathsep + parts if parts else "")
        )
    importlib.invalidate_caches()
    return _findable()


def ensure_protobuf_on_workers(spark) -> bool:
    """Make the vendored runtime reach JVM-spawned Python workers of an
    ALREADY-RUNNING session.

    ``ensure_protobuf`` can only help workers when it runs before the
    JVM starts (the JVM freezes its environment at launch, and local
    workers inherit it). The round driver creates its own
    ``SparkSession`` before importing this package, so the TWS query
    itself must patch the live session: PySpark copies
    ``sc.environment`` into every Python function's worker env at
    function-creation time, which is how the vendor dir reaches the
    ``StreamingPythonRunner`` worker regardless of JVM launch env
    (verified empirically: a JVM launched without the path runs TWS
    after this call).
    """
    if not ensure_protobuf():
        return False
    env = spark.sparkContext.environment
    cur = env.get("PYTHONPATH", "")
    if VENDOR_DIR not in cur.split(os.pathsep):
        env["PYTHONPATH"] = VENDOR_DIR + (os.pathsep + cur if cur else "")
    return True
