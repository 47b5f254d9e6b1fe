#!/usr/bin/env python3
"""Regenerate the README gate-coverage line from Verify's own output.

Hand-maintained counts drifted twice (r7: 67 vs 68; r8: stale again), so
the line between the ``counts:begin``/``counts:end`` markers is now
written from ``verify_summary.json`` — the file ``graft.Verify`` emits
alongside the parquet dumps — and never edited by hand.

Usage: scripts/update_counts.py <verify_out_dir> [readme]
"""
import json
import re
import sys


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    readme = sys.argv[2] if len(sys.argv) > 2 else "README.md"
    with open(f"{out_dir}/verify_summary.json") as f:
        s = json.load(f)
    rows_only = ", ".join(f"`{n}`" for n in s["rows_only"]) or "(none)"
    line = (
        f"  Gate coverage: {s['oracles']}/{s['oracles']} oracle queries "
        f"green at sf0.01 AND sf0.1, plus\n  rows-only checks for "
        f"{rows_only} ({s['queries']} queries total).\n"
    )
    with open(readme) as f:
        text = f.read()
    pattern = re.compile(
        r"(<!-- counts:begin[^>]*-->\n).*?(  <!-- counts:end -->)",
        re.DOTALL,
    )
    new, n = pattern.subn(lambda m: m.group(1) + line + m.group(2), text)
    if n != 1:
        sys.exit(f"expected exactly one counts block in {readme}, found {n}")
    with open(readme, "w") as f:
        f.write(new)
    print(f"updated {readme}: {s['oracles']} oracles / {s['queries']} queries, "
          f"rows-only: {s['rows_only']}")


if __name__ == "__main__":
    main()
