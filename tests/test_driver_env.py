"""The external driver runs ``__spark_entry__`` in its OWN session — a
fresh JVM with default memory (1g driver), not the tuned big-session the
local suite uses. That environment class exposed a real bug the big
session masked (dedup_clusters' unchecked exponential lineage OOM'd a 1g
driver on plan metadata alone). This test pins the class: the heaviest
registry keys must run to completion in a subprocess with a
default-memory local session.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

#: the registry's heavyweights: iterative lineage (clusters), packed
#: block pair-join (cosine), widest shuffle fan (minhash), and the
#: two-level prefix sum (seq_pack).
_KEYS = ["dedup_clusters", "dedup_embedding_cosine",
         "op_minhash_dedup", "op_seq_pack"]

#: the driver checks at sf0.01; overridable the same way the rest of
#: the suite is (SPARK_GRAFT_TEST_SF_DIR picks the sibling sf0.01 of
#: whatever fixture root is in use, so the test follows a relocated
#: fixture tree instead of silently pinning /root/testdata).
def _driver_sf_dir() -> str:
    import os

    base = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                          "/root/testdata/sf0.001")
    return str(Path(base).parent / "sf0.01")


_SCRIPT = """
import sys
sys.path.insert(0, {root!r})
import __spark_entry__ as E
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
qs = E.queries()
for k in {keys!r}:
    n = qs[k](spark, {sf_dir!r}).toPandas().shape[0]
    assert n > 0, k
    print("OK", k, n, flush=True)
print("ALL_OK")
"""


def test_heavy_keys_survive_default_memory_driver():
    script = _SCRIPT.format(root=str(ROOT), keys=_KEYS,
                            sf_dir=_driver_sf_dir())
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600, cwd=str(ROOT))
    assert "ALL_OK" in proc.stdout, (
        f"fresh 1g-driver run failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}")


def test_session_uses_legacy_py4j_gateway_mode():
    """r15: the fc-v20 kernel costs ~30.5 ms per py4j round-trip under
    the pinned-thread ClientServer (raw loopback: 0.16 ms; plain Java
    echo: 0.09 ms), putting a ~1.7 s floor under every Spark job and
    inflating the sf0.1 bench 5x. session.py pins PYSPARK_PIN_THREAD=
    false (legacy GatewayServer: 1.84 ms/call, 0.23 s job floor). This
    pins both the env contract and that the live gateway really is
    legacy mode — a pyspark upgrade that ignores the env var would
    silently reintroduce the regression."""
    import os

    from py4j.clientserver import ClientServer

    from blockchain_data_ingestion_spark.session import get_spark

    assert os.environ.get("PYSPARK_PIN_THREAD") == "false"
    spark = get_spark("gateway-mode-pin")
    gw = spark.sparkContext._gateway
    assert not isinstance(gw, ClientServer), (
        "SparkSession is running py4j in pinned-thread ClientServer "
        "mode; expected legacy GatewayServer (see session.py r15 note)")
