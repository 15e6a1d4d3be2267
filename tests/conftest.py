from __future__ import annotations

import os
import sys
import tempfile

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.001"  # fast local gate; the driver runs sf0.01


def _ensure_protobuf() -> bool:
    """transformWithStateInPandas workers speak a protobuf protocol;
    the package is not installed in this sandbox, but a pure-python
    copy ships inside other locally-installed tooling (google-cloud-
    sdk bundles one).  Expose JUST its ``google`` package via a
    symlink shim on sys.path AND $PYTHONPATH — the latter BEFORE the
    JVM starts, so Spark's Python workers inherit it.  Test
    scaffolding only: product code never imports protobuf.  Override
    the search with $RTDAC_PROTOBUF_GOOGLE_DIR (a path to a
    ``google`` package directory containing ``protobuf``)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    cands = [
        os.environ.get("RTDAC_PROTOBUF_GOOGLE_DIR"),
        "/usr/lib/google-cloud-sdk/platform/google_appengine/google",
    ]
    for g in cands:
        if not g or not os.path.isdir(os.path.join(g, "protobuf")):
            continue
        shim = os.path.join(tempfile.gettempdir(), "rtdac_pb_shim")
        os.makedirs(shim, exist_ok=True)
        link = os.path.join(shim, "google")
        if not os.path.islink(link):
            try:
                os.symlink(g, link)
            except OSError:
                continue
        sys.path.append(shim)
        os.environ["PYTHONPATH"] = (
            shim + os.pathsep + os.environ.get("PYTHONPATH", "")
        )
        # the found runtime may trail pyspark's gencode by a minor
        # version (e.g. runtime 6.32 vs StateMessage_pb2 gencode
        # 6.33); protobuf's own escape hatch accepts that for this
        # scaffolding — the state protocol uses no newer features
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        try:
            import google.protobuf  # noqa: F401

            return True
        except ImportError:
            sys.path.remove(shim)
    return False


HAS_PROTOBUF = _ensure_protobuf()

from real_time_data_analytics_cassandra_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rtdac-tests", shuffle_partitions=8)
    yield s
    s.stop()
