#!/usr/bin/env python
"""Fast pre-flight over exactly the driver-visible correctness subset.

The external driver oracle-checks only ~50 of the registry's keys (the
key set of ``CORRECTNESS_r*.json``) — a regression in one of those is a
headline CORRECTNESS failure even when the full local suite would have
caught it hours earlier. This tool runs precisely that subset through
``tests.oracle.check_key`` at sf0.01 in one session (< 2 min), so the
driver's gate can never see a failure the builder didn't see first.

Usage::

    python tools/check_driver_subset.py            # sf0.01, driver keys
    python tools/check_driver_subset.py /root/testdata/sf0.001
    python tools/check_driver_subset.py --rotate   # round-rotating slice
    python tools/check_driver_subset.py --rotate --slice 2  # explicit slice

Exit code 0 iff every driver-visible key passes (keys the driver records
as ``no_oracle`` are run rows-only, mirroring the driver).

``--rotate`` (r10, VERDICT r9 item 6): the driver has sampled the SAME
50 keys for nine rounds, so 270+ keys have never been executed through
the driver's exact entry point. This mode runs a deterministic 54-key
slice of the FULL registry — slice index = the round number inferred
from the newest ``CORRECTNESS_r*.json``, modulo 6, over the sorted key
list — through ``__spark_entry__.queries()`` / ``oracle_sql()`` (the
driver's own adapter, not the internal registry object), cycling every
key through driver-path execution every ~6 rounds. Run it at round
open and commit the log.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def driver_keys() -> list[str]:
    """Key set of the newest CORRECTNESS_r*.json (the driver has used the
    identical set every round so far)."""
    snaps = sorted(ROOT.glob("CORRECTNESS_r*.json"))
    if not snaps:
        raise SystemExit("no CORRECTNESS_r*.json snapshot found")
    return list(json.loads(snaps[-1].read_text()))


def rotating_slice(force_idx: int | None = None) -> tuple[int, int, list[str]]:
    """(round, slice_idx, keys): the deterministic registry slice for
    this round. The slice keys off a CONTENT hash of each key name
    (md5 % 6), not its sorted-registry index — an index-based residue
    shifts whenever earlier-sorting keys are added (the registry grew
    by 7 ≡ 1 (mod 6) in r10, which would let a key chase the rotating
    slice forever), while the hash residue is churn-stable, so every
    key really is executed through __spark_entry__ every 6 rounds."""
    import hashlib

    import __spark_entry__ as E

    snaps = sorted(ROOT.glob("CORRECTNESS_r*.json"))
    rnd = (int(snaps[-1].stem.rsplit("r", 1)[-1]) + 1) if snaps else 1
    idx = rnd % 6 if force_idx is None else force_idx % 6
    keys = sorted(E.queries())
    return rnd, idx, [
        k for k in keys
        if int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % 6 == idx]


def main() -> int:
    argv = sys.argv[1:]
    rotate = "--rotate" in argv
    force_idx = None
    if "--slice" in argv:
        i = argv.index("--slice")
        force_idx = int(argv[i + 1])
        del argv[i:i + 2]
    args = [a for a in argv if a != "--rotate"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from blockchain_data_ingestion_spark.session import get_spark
    from tests.oracle import check_key

    spark = get_spark("driver-subset-preflight",
                      extra_conf={"spark.ui.enabled": "false"})
    failures = []
    if rotate:
        rnd, idx, keys = rotating_slice(force_idx)
        print(f"rotating slice {idx}/6 for round {rnd}: "
              f"{len(keys)} keys through __spark_entry__")
    else:
        keys = driver_keys()
    def check_via_entry(k: str) -> str | None:
        """The driver's path: __spark_entry__ adapter + hash compare."""
        import __spark_entry__ as E

        from tests.oracle import compare_frames, run_oracle

        spark_pdf = E.queries()[k](spark, sf_dir).toPandas()
        osql = E.oracle_sql().get(k)
        if osql is None:
            return None  # rows-only, mirroring the driver
        return compare_frames(spark_pdf, run_oracle(sf_dir, osql))

    for k in keys:
        try:
            err = check_via_entry(k) if rotate else check_key(spark, sf_dir, k)
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            err = f"{type(exc).__name__}: {exc}"
        from blockchain_data_ingestion_spark.caching import release_all
        release_all()  # bounded block-manager footprint across keys
        status = "ok" if err is None else "FAIL"
        print(f"{status:4} {k}" + ("" if err is None else f"  {err}"))
        if err is not None:
            failures.append(k)
    print(f"\n{len(keys) - len(failures)}/{len(keys)} driver-visible keys "
          f"pass at {sf_dir}")
    if failures:
        print("FAILING:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
