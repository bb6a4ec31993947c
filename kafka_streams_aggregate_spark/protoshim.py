"""Activation for the vendored pure-Python protobuf shim.

PySpark's ``transformWithStateInPandas`` worker protocol is a generated
protobuf module (``pyspark/sql/streaming/proto/StateMessage_pb2.py``)
that needs a ``google.protobuf`` runtime. When the real wheel is
installed it must always win; when it is absent (as in this sandbox),
``ensure_protobuf()`` prepends the shim directory to both ``sys.path``
(this process) and ``os.environ['PYTHONPATH']`` (so the JVM-spawned
Python workers — where the state-server client actually runs — inherit
it). Call it BEFORE the SparkSession/JVM is created or workers won't
see it.
"""

from __future__ import annotations

import os
import sys

_SHIM_DIR = os.path.join(os.path.dirname(__file__), "vendor", "protoshim")


def ensure_protobuf() -> str:
    """Make ``google.protobuf`` importable. Returns "real" if the real
    runtime is present, "shim" if the vendored shim was activated."""
    try:
        import google.protobuf  # noqa: F401

        shimmed = getattr(
            sys.modules.get("google"), "__path__", [""]
        )
        if any(str(p).startswith(_SHIM_DIR) for p in shimmed):
            return "shim"
        return "real"
    except ImportError:
        pass
    if _SHIM_DIR not in sys.path:
        sys.path.insert(0, _SHIM_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if _SHIM_DIR not in parts:
        os.environ["PYTHONPATH"] = (
            _SHIM_DIR + (os.pathsep + existing if existing else "")
        )
    return "shim"
