"""Merge per-shard conformance summaries (SPARK_GRAFT_CONF_OUT files)
into one CONFORMANCE.md. Usage: python merge_conformance.py shard1.md ...
Category order follows conformance.SUPPORTED_CATEGORIES.
"""

from __future__ import annotations

import re
import sys

from conformance import SUPPORTED_CATEGORIES

ROW = re.compile(r"^\| (\S+) \| (\d+) \| (\d+) \| (\d+) \| (\d+) \|$")


def main() -> None:
    cats: dict[str, tuple[int, int, int, int]] = {}
    failures: list[str] = []
    for path in sys.argv[1:]:
        in_failures = False
        for line in open(path):
            line = line.rstrip("\n")
            if line.startswith("## Failures"):
                in_failures = True
                continue
            if in_failures and line.startswith("- "):
                failures.append(line)
                continue
            m = ROW.match(line)
            if m and not m.group(1).startswith("**"):
                new = tuple(int(m.group(i)) for i in range(2, 6))
                old = cats.get(m.group(1))
                # same category split across shards (SPARK_GRAFT_CONF_SHARD)
                # → counts are additive
                cats[m.group(1)] = (
                    tuple(a + b for a, b in zip(old, new)) if old else new
                )

    order = [c for c in SUPPORTED_CATEGORIES if c in cats] + sorted(
        c for c in cats if c not in SUPPORTED_CATEGORIES
    )
    lines = [
        "# CONFORMANCE — reference golden corpus results",
        "",
        "| category | pass | fail | error | skip |",
        "|---|---|---|---|---|",
    ]
    tot = [0, 0, 0, 0]
    for c in order:
        p, f, e, s = cats[c]
        lines.append(f"| {c} | {p} | {f} | {e} | {s} |")
        for i, v in enumerate((p, f, e, s)):
            tot[i] += v
    lines.append(f"| **total** | **{tot[0]}** | **{tot[1]}** | **{tot[2]}** | **{tot[3]}** |")
    if failures:
        lines += ["", "## Failures", ""] + failures
    with open("CONFORMANCE.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines[:12]))


if __name__ == "__main__":
    main()
