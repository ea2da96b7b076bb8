"""Runtime scratch space for sink/streaming operators.

Lives inside the repo (``.scratch/``, gitignored) because the build
environment forbids writes outside the repo tree. Paths are deterministic
per (purpose, tag) so repeated runs overwrite instead of accumulating.
"""

from __future__ import annotations

import shutil
from pathlib import Path

__all__ = ["scratch_dir", "fresh_scratch_dir"]

_ROOT = Path(__file__).resolve().parent.parent / ".scratch"


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
