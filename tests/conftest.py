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

from etl_seattle_call_data_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
