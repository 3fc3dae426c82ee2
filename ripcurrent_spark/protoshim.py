"""Make ``google.protobuf`` importable when the distribution is absent.

pyspark's ``transformWithStateInPandas`` talks to the JVM state server
through protobuf messages (``pyspark/sql/streaming/proto/
StateMessage_pb2.py``), so the API is unusable on images without the
protobuf wheel.  ``ensure_protobuf()`` falls back to the vendored
minimal runtime under ``ripcurrent_spark/_vendor`` (see
``_vendor/google/protobuf/_mini.py``): it prepends the vendor dir to
``sys.path`` for the driver AND to ``$PYTHONPATH`` so Python *workers*
spawned by the JVM inherit it — which is why it must run before the
first SparkSession (the py4j gateway snapshot of the environment is
taken at JVM launch).

If the real protobuf is installed, this is a no-op: the vendor dir is
never put on the path, so the genuine runtime always wins.
"""

from __future__ import annotations

import importlib
import os
import sys
from pathlib import Path

_VENDOR = Path(__file__).resolve().parent / "_vendor"
_MODE: str | None = None


def protobuf_available() -> bool:
    try:
        importlib.import_module("google.protobuf")
        return True
    except ImportError:
        return False


def ensure_protobuf() -> str:
    """Return "real", "vendored", or raise ImportError.

    Must be called before the SparkSession is created for worker
    processes to see the vendored path. Idempotent: reports the mode
    the first call resolved to.
    """
    global _MODE
    if _MODE is not None:
        return _MODE
    if protobuf_available():
        _MODE = "real"
        return _MODE
    vendor = str(_VENDOR)
    if vendor not in sys.path:
        sys.path.insert(0, vendor)
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if vendor not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join([vendor] + parts)
    importlib.import_module("google.protobuf")  # raises if still broken
    _MODE = "vendored"
    return _MODE
