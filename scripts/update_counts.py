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
    # The published count is the COMPARED-green tally from selfcheck's
    # comparator run — a declared oracle that was never compared (or that
    # the comparator errors on) cannot ship as green (the r11 embed_sq
    # "0 failures" drift). selfcheck.py writes this file on every run.
    with open(f"{out_dir}/selfcheck_results.json") as f:
        cmp_results = json.load(f)
    green = sorted(
        n for n, v in cmp_results.items()
        if not v.get("err") and v.get("rows_match")
        and v.get("schema_match") and v.get("hash_match"))
    red = sorted(set(cmp_results) - set(green))
    if len(cmp_results) != s["oracles"]:
        sys.exit(
            f"declared {s['oracles']} oracles but selfcheck compared "
            f"{len(cmp_results)} — rerun scripts/selfcheck.py on {out_dir}")
    rows_only = ", ".join(f"`{n}`" for n in s["rows_only"]) or "(none)"
    red_note = (f" **{len(red)} FAILING: " + ", ".join(f"`{n}`" for n in red)
                + ".**") if red else ""
    line = (
        f"  Gate coverage: {len(green)}/{s['oracles']} oracle queries "
        f"compared green at sf0.01 AND sf0.1,{red_note} plus\n  rows-only "
        f"checks for {rows_only} ({s['queries']} queries total).\n"
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
    print(f"updated {readme}: {len(green)}/{s['oracles']} oracles compared "
          f"green / {s['queries']} queries, failing: {red}, "
          f"rows-only: {s['rows_only']}")


if __name__ == "__main__":
    main()
