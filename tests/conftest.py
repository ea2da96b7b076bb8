from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_data_ingestion_spark.caching import (  # noqa: E402
    release_all, release_shared)
from blockchain_data_ingestion_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bdi-spark-tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.ui.enabled": "false"})
    yield s
    # The persist-leak gate (VERDICT r9 item 4): every operator that
    # holds block-manager state past its return must route it through
    # caching.scoped_persist/scoped_checkpoint/scoped_register, and the
    # autouse fixture below releases after each test — so by session
    # teardown the block manager must be EMPTY. A bare .persist() /
    # .localCheckpoint() that outlives its test fails here, at commit
    # time, instead of accumulating in a long-lived session.
    release_all()
    release_shared()   # r13 build-once graph bases live outside _LIVE
    leaked = dict(s.sparkContext._jsc.getPersistentRDDs())
    assert not leaked, (
        f"{len(leaked)} RDD(s) left in the block manager at session "
        f"teardown — an op persisted/checkpointed outside "
        f"blockchain_data_ingestion_spark.caching: "
        f"{[(i, r.name()) for i, r in list(leaked.items())[:5]]}")


@pytest.fixture(autouse=True)
def _release_scoped_state(request):
    """Free registered block-manager state after every test so the
    suite's footprint is bounded by one test's working set (and so the
    session-teardown leak assert above is meaningful). Test-local
    ``.cache()`` calls (several fixtures cache an op result to assert
    over it repeatedly) go through the SQL cache manager, so
    ``clearCache()`` covers them without each test having to clean up."""
    yield
    release_all()
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").catalog.clearCache()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
