#!/usr/bin/env python3
"""Merge the sf10 wave/retry reports into CORRECTNESS_SF10_FULL_r11.json.

A later report's result supersedes an earlier one for the same entry
(the retry sweep re-runs temp-capped oracles with a bigger budget).
Usage: python3 tools/merge_sf10.py <out.json> <report.json>...
"""
import json, sys

out_path = sys.argv[1]
merged = {}
for p in sys.argv[2:]:
    try:
        merged.update(json.load(open(p)))
    except FileNotFoundError:
        print(f"-- skipping missing {p}", file=sys.stderr)

counts = {}
for v in merged.values():
    counts[v["status"]] = counts.get(v["status"], 0) + 1
report = {
    "counts": counts,
    "entries": dict(sorted(merged.items())),
}
json.dump(report, open(out_path, "w"), indent=1)
print(counts, f"total={len(merged)}")
