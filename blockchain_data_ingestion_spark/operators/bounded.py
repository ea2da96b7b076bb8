"""Deliberately-global window specs for provably metadata-sized frames.

An ordered window with no partition spec moves its WHOLE input to one
partition — a scale killer on fact-grain data, and exactly the right
plan on a frame that is bounded by construction (a |buckets|-row bucket
prefix, a |partitions|-row offset table, a top-25 report slice). The
repo runs a dozen such windows, every one individually audited as
bounded (VERDICT r11/r12), and their runtime `WindowExec: No Partition
Defined` warnings flooded every bench/parity tail — so the warning
could no longer flag a future UNINTENTIONAL global window.

r13 contract (VERDICT r12 item 4), three interlocking pieces:

1. Every intentional global window routes through
   :func:`bounded_window`, which REQUIRES a written boundedness
   argument (`bound=`) — the justification lives at the call site, not
   in tribal memory, and a site without one fails at import time.
2. ``session.get_spark`` raises the WindowExec logger to ERROR: the
   warning leaves the tails, so logs are signal again for everything
   else. Suppressing it is safe ONLY because of piece 3.
3. The real alarm is mechanical, not textual: the two-sided plan walk
   `test_unpartitioned_ordered_windows_are_whitelisted` flags every
   ordered-empty-partition Window in every registry key's optimized
   plan against a per-key allowlist (new offender fails; stale
   allowlist row fails), and `test_global_window_sites_use_helper`
   fails any NEW `Window.orderBy(` call site in the package that
   bypasses this helper.
"""

from __future__ import annotations

from pyspark.sql import WindowSpec
from pyspark.sql.window import Window

__all__ = ["bounded_window"]


def bounded_window(*order_cols, bound: str) -> WindowSpec:
    """An ordered, deliberately single-partition WindowSpec.

    ``bound`` must state WHY the window's input is metadata-sized by
    construction (e.g. ``"|buckets| rows, ≤ id_space/2^20"``). It is a
    load-bearing argument, not decoration: call sites are audited
    against it, and the plan-walk lint keyed by registry key is the
    mechanical check that the claim stays true.
    """
    if not bound or len(bound.strip()) < 10:
        raise ValueError(
            "bounded_window requires a substantive boundedness argument "
            "(why is this frame metadata-sized at any SF?)")
    return Window.orderBy(*order_cols)
