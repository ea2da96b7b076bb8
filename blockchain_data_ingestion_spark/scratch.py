"""Runtime scratch space for sink/streaming operators.

Lives inside the repo (``.scratch/``, gitignored) because the build
environment forbids writes outside the repo tree. Paths are deterministic
per (purpose, tag) *within a process* so repeated runs overwrite instead
of accumulating, but namespaced by PID so concurrent sessions (test suite
+ ad-hoc shell, driver + bench) never clobber each other's sink/bucket
dirs mid-read. Stale PID namespaces are swept on import.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

__all__ = ["scratch_dir", "fresh_scratch_dir"]

_BASE = Path(__file__).resolve().parent.parent / ".scratch"
_ROOT = _BASE / f"pid{os.getpid()}"


def _sweep_stale() -> None:
    """Best-effort removal of scratch namespaces whose process is gone."""
    try:
        for p in _BASE.glob("pid*"):
            try:
                pid = int(p.name[3:])
            except ValueError:
                continue
            if pid == os.getpid():
                continue
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                shutil.rmtree(p, ignore_errors=True)
            except PermissionError:
                pass  # alive, owned elsewhere
    except OSError:
        pass


_sweep_stale()


def scratch_dir(*parts: str) -> str:
    p = _ROOT.joinpath(*parts)
    p.mkdir(parents=True, exist_ok=True)
    return str(p)


def fresh_scratch_dir(*parts: str) -> str:
    """Like :func:`scratch_dir` but cleared first (idempotent reruns)."""
    p = Path(scratch_dir(*parts))
    shutil.rmtree(p, ignore_errors=True)
    p.mkdir(parents=True, exist_ok=True)
    return str(p)


_DUCK_TMP = Path(__file__).resolve().parent.parent / ".tmp"


def duckdb_spill_config() -> dict:
    """Connection config pinning DuckDB's spill (temp_directory) to
    the REPO's .tmp regardless of process cwd — DuckDB's default for
    in-memory connections is cwd-relative ``.tmp``, so a tool launched
    from elsewhere would spill where no cleanup ever looks (r11 review
    pass 3; the 66 GB incident guard only works if spill and cleanup
    agree on the directory).

    PID-namespaced like ``.scratch`` (r12): the flat layout let one
    tool's start-time sweep unlink ANOTHER LIVE tool's spill file, and
    DuckDB does not "just recreate" a vanished spill file — it calls
    ``std::terminate`` and takes the whole process down (measured: the
    r12 sf10 sweep died at key 57/258 when a concurrent fuzz run's
    sweep removed duckdb_temp_storage-0.tmp from under it)."""
    d = _DUCK_TMP / f"pid{os.getpid()}"
    d.mkdir(parents=True, exist_ok=True)
    # memory_limit: DuckDB's default is 80% of RAM (~100 GB here),
    # which lets one hot replicated-tier oracle balloon PAST the
    # box's real headroom before it ever spills — measured r12:
    # op_attribution_last_touch's oracle at sf10 hit 88 GB anon RSS
    # and the kernel OOM-killed the sweep twice. A bounded oracle
    # spills to the pid dir instead and stays alive; override via
    # SPARK_GRAFT_DUCK_MEM for boxes with different headroom.
    return {"temp_directory": str(d),
            "memory_limit": os.environ.get("SPARK_GRAFT_DUCK_MEM",
                                           "24GB")}


def drop_stale_duck_spill() -> None:
    """DuckDB spills large-closure queries to temp_directory and
    cleans up on close — but a KILLED oracle run leaves the spill
    behind. 66 GB of it (r11: the sf10 closure oracles) throttled the
    whole box's I/O and skewed a bench pair until found. Tools call
    this at start. ONE definition (r11 review pass 3 found three
    drifting copies). Only DEAD processes' namespaces are removed —
    see duckdb_spill_config for why touching a live one is fatal; the
    flat-file glob mops up pre-pid-layout leftovers only."""
    for f in _DUCK_TMP.glob("duckdb_temp_storage-*"):
        try:
            f.unlink()
        except OSError:
            pass
    for d in _DUCK_TMP.glob("pid*"):
        try:
            pid = int(d.name[3:])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass  # alive, owned elsewhere
