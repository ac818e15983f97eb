from __future__ import annotations

import os
import sys

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# transformWithStateInPandas workers speak protobuf to the JVM state
# server; this container has no google.protobuf, but vendor/protobuf_shim
# aliases the Cloud SDK's pure-Python runtime. Wire it into BOTH this
# process (sys.path) and the Spark python workers (PYTHONPATH env, which
# pyspark propagates to workers) before any session starts.
_SHIM = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor", "protobuf_shim")
try:  # pragma: no cover - depends on environment
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(_SHIM):
        sys.path.insert(0, _SHIM)
        os.environ["PYTHONPATH"] = _SHIM + os.pathsep + os.environ.get("PYTHONPATH", "")

# Fail LOUDLY if the shim did not actually resolve: the shim leans on
# /usr/lib/google-cloud-sdk's vendored pure-Python protobuf being
# present (vendor/protobuf_shim/README.md). If a future container drops
# the SDK, the TWS e2e tests would silently re-skip — this assert keeps
# the 0-skip invariant honest by making the breakage a collection error.
try:
    import google.protobuf  # noqa: F401
except ImportError as _e:  # pragma: no cover - container regression only
    raise RuntimeError(
        "google.protobuf failed to resolve even via vendor/protobuf_shim "
        "(is /usr/lib/google-cloud-sdk still present?); the "
        "transformWithStateInPandas e2e tests cannot run: " + repr(_e)
    ) from _e

from etl_seattle_call_data_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
