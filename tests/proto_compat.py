"""Make `google.protobuf` importable for the transformWithStateInPandas
test without network access.

TWS's state-server protocol needs protobuf in BOTH the driver and every
executor-forked Python worker. This environment has no installed protobuf
(requirements-optional.txt pins it for real deployments), but the
google-cloud-sdk on the image bundles a pure-python runtime. ensure:

- driver: put the bundle on sys.path and no-op the gencode/runtime
  version gate (runtime 6.32 vs pyspark gencode 6.33 — one minor apart,
  wire format identical; a message round-trip runs inside the TWS test).
- workers: prepend tests/_proto_shim to PYTHONPATH *before* the
  SparkSession exists, so each worker interpreter runs the shim's
  sitecustomize at startup and gets the same two fixes.

The probe imports ``google.protobuf.descriptor``, not ``google.protobuf``:
Spark adds spark-core_*.jar to the workers' PYTHONPATH, whose ``google/``
directory forms a broken namespace package that makes the bare import
"succeed" with no content (see tests/_proto_shim/sitecustomize.py).

When protobuf is properly installed, both paths are no-ops.
"""

from __future__ import annotations

import os
import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
_SHIM_DIR = os.path.join(os.path.dirname(__file__), "_proto_shim")


def _protobuf_usable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_protobuf() -> bool:
    """True when google.protobuf is usable (natively or via shim).
    Must run before the SparkSession is created to reach the workers."""
    if _protobuf_usable():
        return True
    if not os.path.isdir(os.path.join(_APPENGINE, "google", "protobuf")):
        return False
    for mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
        del sys.modules[mod]
    sys.path.insert(0, _APPENGINE)
    try:
        from google.protobuf import runtime_version

        runtime_version.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:  # older bundle without the gate — nothing to relax
        pass
    existing = os.environ.get("PYTHONPATH", "")
    parts = [_SHIM_DIR] + ([existing] if existing else [])
    os.environ["PYTHONPATH"] = os.pathsep.join(parts)
    return _protobuf_usable()
