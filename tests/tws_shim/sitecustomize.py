"""Test-env shim: make ``google.protobuf`` importable so Spark 4's
``transformWithStateInPandas`` state-server protocol can run.

This container ships no ``protobuf`` distribution (and installs are
off-limits), but the google-cloud-sdk already bundles a pure-Python
protobuf 6.32.0 under its appengine platform dir. Two quirks to
work around:

1. Spark jars sit on the TWS driver-worker's ``sys.path`` and expose
   ``google/protobuf/*.proto`` RESOURCE entries, which zipimport
   happily treats as a phantom namespace package — so a bare
   ``import google.protobuf`` *succeeds* while having no Python in
   it. Probe ``google.protobuf.descriptor`` (a real module) instead,
   and purge the phantom from ``sys.modules`` before retrying.
2. pyspark's generated ``StateMessage_pb2`` was built with gencode
   6.33.0; the 6.32.0 runtime's version gate refuses to load
   minor-older gencode. The wire format and generated-code API are
   unchanged between those minors for this proto, so the validator
   is no-op'd — test env only; a production image would install a
   current protobuf and never load this file.

Named ``sitecustomize`` so that putting this DIRECTORY on
``PYTHONPATH`` applies the shim automatically in every Python
process the JVM spawns (TWS driver worker, daemon workers).
``tests/conftest.py`` sets that env var before the first
SparkSession and applies the same logic in-process.
"""

import os
import sys

_APPENGINE = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def ensure_protobuf() -> bool:
    """Return True iff a working google.protobuf is importable,
    vendoring the container's bundled pure-Python copy if needed."""
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except Exception:
        pass
    if not os.path.isdir(os.path.join(_APPENGINE, "google", "protobuf")):
        return False
    # Drop the phantom namespace package (jar resource dirs) so the
    # retry re-resolves google.* against the appended real package.
    for _k in [k for k in sys.modules if k == "google" or k.startswith("google.")]:
        del sys.modules[_k]
    if _APPENGINE not in sys.path:
        sys.path.append(_APPENGINE)
    try:
        import google.protobuf.descriptor  # noqa: F401

        return True
    except Exception:
        return False


if ensure_protobuf():
    try:
        from google.protobuf import runtime_version as _rv

        _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
    except Exception:
        pass
