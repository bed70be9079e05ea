"""Worker-side protobuf compatibility shim (see tests/proto_compat.py).

This directory is prepended to PYTHONPATH before the test SparkSession
starts, so every Python worker the executors fork imports this module at
interpreter startup (the `site` machinery imports `sitecustomize` from
sys.path). It makes `google.protobuf` usable in environments where the
package isn't installed but the google-cloud-sdk's bundled pure-python
runtime is on disk.

Two traps this handles:
- Spark puts spark-core_*.jar on the workers' PYTHONPATH and that jar
  contains a ``google/`` directory — zipimport turns it into a broken
  namespace package, so ``import google.protobuf`` SUCCEEDS while
  ``from google.protobuf import descriptor`` fails. The probe must import
  a real module, and the bundle must go to the FRONT of sys.path so its
  regular ``google/protobuf`` package wins over the jar's namespace
  portion.
- The bundled runtime trails pyspark's generated code by one minor
  version; the gencode/runtime gate is relaxed (wire format unaffected).
"""

import sys


def _protobuf_usable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if not _protobuf_usable():
    import os

    _APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"
    if os.path.isdir(os.path.join(_APPENGINE, "google", "protobuf")):
        for mod in [m for m in sys.modules if m == "google" or m.startswith("google.")]:
            del sys.modules[mod]
        sys.path.insert(0, _APPENGINE)
        try:
            from google.protobuf import runtime_version

            runtime_version.ValidateProtobufRuntimeVersion = (
                lambda *a, **k: None
            )
        except Exception:
            pass
