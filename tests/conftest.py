from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# transformWithStateInPandas needs google.protobuf in every Spark-spawned
# python process; the shim vendors the container's bundled pure-Python
# copy (see tests/tws_shim/sitecustomize.py). PYTHONPATH must carry the
# shim dir BEFORE the first SparkSession so the JVM's workers inherit it;
# the same logic is applied to this process here (sitecustomize only
# auto-runs at interpreter startup, which has already happened).
_TWS_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tws_shim")
os.environ["PYTHONPATH"] = _TWS_SHIM + os.pathsep + os.environ.get("PYTHONPATH", "")
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "_tws_sitecustomize", os.path.join(_TWS_SHIM, "sitecustomize.py")
)
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

from twitter_etl_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest")
    yield s
