#!/usr/bin/env python
"""Full-registry oracle hash parity at an arbitrary tier — the r12
extension of the per-round sf0.1 parity run to the replicated
`.scale_cache` tiers (sf1/sf3/sf10).

Both r11 cross-engine divergences (ring wrap index, backfill median
cast) were invisible at sf0.01 and live at sf0.1; this tool asks the
same question one more tier up, where per-key histories are 10× deeper
and fixture-calibrated predicate arms fire on different rows. Both
engines read the SAME parquet, so parity is meaningful regardless of
how a key's thresholds were calibrated.

Usage::

    python tools/parity_sweep.py [sf_dir] [--resume-after KEY]

Default sf_dir is `.scale_cache/sf1` (built by tools/scale_probe.py).
Keys whose DuckDB oracle is known-infeasible at replicated tiers are
SKIPPED and named in the log (never silently — the no-silent-caps
rule): the unrolled triangle-closure oracle measured >590 s at sf1
(SCALE.md r8). SKIP names are validated against the live registry at
start — the first draft skipped a GUESSED name (`op_graph_triangles`)
that matched nothing, and the sweep walked straight into the 590 s
oracle it existed to avoid. A per-key wall budget flags (not fails)
over-budget keys as `SLOW`. `--resume-after K` restarts a killed sweep
from the key after K in sorted order. `--skip k1,k2` adds tier-specific
skips (e.g. the quadratic-oracle keys that are fine at sf1 but blow the
budget ×9 at sf3) — validated against the registry like SKIP.
`--only k1,k2,...` restricts the sweep to the named keys (registry-
validated) — the sf10 mode: that tier replicates ONLY
events/orders/lineitem (scale_probe.build_sf10), so keys reading just
dims/documents/embeddings see sf1 data they are already green on, and
re-running them buys nothing. `--only-file PATH` reads the same list
from a file (one key per line) so the 258-key fact subset doesn't have
to live on a command line.

Exit 0 iff every non-skipped key matches (rows + columns +
order-insensitive value hash, the driver's own compare).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

#: DuckDB-side infeasible at replicated tiers — EMPTY since r13: the
#: triangle twin's >590 s was CTE re-inlining, not wedge algebra;
#: MATERIALIZED pins dropped it to 36.8 s at sf1 (hash-green, r13).
#: Tier-specific blow-ups go through --skip, named on the command line.
SKIP: dict[str, str] = {}

#: per-key wall budget (engine + oracle together) before a key is
#: flagged SLOW in the log (it still finishes — the budget only warns).
BUDGET_S = 120.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--") else str(ROOT / ".scale_cache" / "sf1")
    from blockchain_data_ingestion_spark.caching import release_all
    from blockchain_data_ingestion_spark.queries import load_all
    from blockchain_data_ingestion_spark.scratch import \
        drop_stale_duck_spill
    from blockchain_data_ingestion_spark.session import get_spark
    from tests.oracle import check_key

    drop_stale_duck_spill()
    # Replicated tiers carry a completion marker (scale_probe._MARKER);
    # a marker-less .scale_cache dir is a killed build's debris (the
    # r13 incident: zero-byte lineitem silently reused). Fail fast —
    # hand-built or driver-provided dirs live OUTSIDE .scale_cache, so
    # inside it marker-less always means rebuild (ADVICE r13).
    d = Path(sf_dir)
    if ".scale_cache" in d.parts and not (d / ".complete").exists():
        raise SystemExit(
            f"{sf_dir} is under .scale_cache but has no .complete "
            "marker — likely a killed scale_probe build's debris; "
            "rerun tools/scale_probe.py to rebuild the tier")
    spark = get_spark("parity-sweep")
    keys = sorted(load_all())
    skip = dict(SKIP)
    if "--skip" in sys.argv:
        for k in sys.argv[sys.argv.index("--skip") + 1].split(","):
            skip[k] = "tier-specific --skip (named on the command line)"
    unknown = [k for k in skip if k not in keys]
    if unknown:  # not assert: survives `python -O` (ADVICE r13)
        raise SystemExit(f"SKIP names unknown keys: {unknown}")
    only: list[str] | None = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")
    if "--only-file" in sys.argv:
        path = Path(sys.argv[sys.argv.index("--only-file") + 1])
        only = (only or []) + [
            ln.strip() for ln in path.read_text().splitlines() if ln.strip()]
    if only is not None:
        bad_only = [k for k in only if k not in keys]
        if bad_only:
            raise SystemExit(f"--only names unknown keys: {bad_only}")
        chosen = set(only)
        keys = [k for k in keys if k in chosen]
    if "--resume-after" in sys.argv:
        after = sys.argv[sys.argv.index("--resume-after") + 1]
        if after not in keys:
            raise SystemExit(f"unknown resume key {after!r}")
        keys = keys[keys.index(after) + 1:]
    bad, slow, skipped = [], [], []
    t_all = time.perf_counter()
    for i, k in enumerate(keys, 1):
        if k in skip:
            skipped.append(k)
            print(f"SKIP {k}: {skip[k]}", flush=True)
            continue
        t0 = time.perf_counter()
        try:
            msg = check_key(spark, sf_dir, k)
        except Exception as e:  # noqa: BLE001
            msg = f"exception: {e}"
        finally:
            release_all()
            spark.catalog.clearCache()
        dt = time.perf_counter() - t0
        tag = "ok  " if msg is None else "FAIL"
        if msg is not None:
            bad.append((k, msg))
        if dt > BUDGET_S:
            slow.append((k, dt))
            tag += " SLOW"
        print(f"{tag} {k} {dt:.1f}s [{i}/{len(keys)}]", flush=True)
    # count skips actually HIT in the loop — a --resume-after slice may
    # not contain a SKIP key at all (review pass 3 catch)
    n_run = len(keys) - len(skipped)
    print(f"\n{n_run - len(bad)}/{n_run} "
          f"hash-green at {sf_dir} in "
          f"{time.perf_counter() - t_all:.0f}s; "
          f"skipped {skipped}; "
          f"slow(>{BUDGET_S:.0f}s): {[(k, round(t)) for k, t in slow]}")
    for k, m in bad:
        print(f"FAIL {k}: {m}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
