"""Protobuf shim applied at interpreter startup.

``site.py`` imports ``sitecustomize`` from ``sys.path`` in every Python
process, so any process whose PYTHONPATH includes this directory gets
the shim — notably the Python children the Spark JVM spawns for
``transformWithStateInPandas`` (the state-v2 driver worker and the
daemon-forked executor workers). Those are fresh processes that import
``StateMessage_pb2`` before any engine module, so the in-process shim
in streaming/state_v2.py cannot reach them; this file can.

Deliberately standalone (no engine or pyspark imports — it runs in
every Python process with this env, and must cost nothing when
protobuf is properly installed). Logic is the twin of
streaming/state_v2.ensure_protobuf — keep the two in sync; the
rationale for the minor-gap relax lives in state_v2's module doc.
"""

import os
import sys

_VENDORED = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _apply() -> None:
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        if not os.path.isdir(os.path.join(_VENDORED, "google", "protobuf")):
            return
        if _VENDORED not in sys.path:
            sys.path.insert(0, _VENDORED)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            return
    try:
        from google.protobuf import runtime_version as _rv
    except ImportError:
        return
    if getattr(_rv, "_sgr_minor_gap_relaxed", False):
        return
    _orig = _rv.ValidateProtobufRuntimeVersion

    def _relaxed(domain, major, minor, patch, suffix, location):  # noqa: ANN001
        try:
            _orig(domain, major, minor, patch, suffix, location)
        except _rv.VersionError:
            # tolerate ONLY a same-major gencode/runtime gap (protobuf's
            # published wire-compat guarantee); majors still raise
            if domain != _rv.Domain.PUBLIC or major != _rv.MAJOR:
                raise

    _rv.ValidateProtobufRuntimeVersion = _relaxed
    _rv._sgr_minor_gap_relaxed = True


_apply()
