#!/usr/bin/env python
"""Regenerate README.md's "Operator inventory" section from the live
registry (key, oracle-mode, first docstring line, grouped by module)."""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchain_data_ingestion_spark.queries import load_all  # noqa: E402

MODULE_ORDER = ["relational", "aggregates", "windows", "scalar", "nested",
                "ingest_q", "streaming_q", "llm_text", "llm_vec",
                "llm_pipeline", "tpch"]


def main() -> None:
    reg = load_all()
    by_mod: dict[str, list] = defaultdict(list)
    for key, spec in sorted(reg.items()):
        mod = spec.spark.__module__.rsplit(".", 1)[-1]
        lines = (spec.spark.__doc__ or "").strip().splitlines() or [""]
        doc = lines[0].strip()
        doc = doc[:72].replace("|", "\\|")
        by_mod[mod].append((key, "SQL" if spec.oracle else "rows", doc))

    out = [f"## Operator inventory (SURVEY.md §2 → registry keys)", "",
           f"Total keys: {len(reg)}", ""]
    mods = MODULE_ORDER + sorted(set(by_mod) - set(MODULE_ORDER))
    for mod in mods:
        rows = by_mod.get(mod)
        if not rows:
            continue
        out += [f"### `{mod}` ({len(rows)})", "", "| key | oracle | what |",
                "|---|---|---|"]
        out += [f"| `{k}` | {o} | {d} |" for k, o, d in rows]
        out.append("")
    section = "\n".join(out).rstrip() + "\n"

    readme_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "README.md")
    text = open(readme_path).read()
    new = re.sub(
        r"## Operator inventory \(SURVEY\.md §2 → registry keys\)\n.*?(?=\n## |\Z)",
        section, text, flags=re.S)
    # keep the prose key counts in sync with the registry too
    new = re.sub(r"any of the \d+ registered operators",
                 f"any of the {len(reg)} registered operators", new)
    new = re.sub(r"The full \d+-key gate is",
                 f"The full {len(reg)}-key gate is", new)
    open(readme_path, "w").write(new)
    print(f"README inventory regenerated: {len(reg)} keys")


if __name__ == "__main__":
    main()
