#!/usr/bin/env python3
"""Merge per-query entries from a standalone bench line into a probe-leg
bench line, rescaling seconds into the target leg's machine-speed frame
(sec * leg_anchor / source_anchor, anchors = fastest observed per run).
Used when a query is probed separately from its SF leg (e.g. a
registration added after the leg ran) so gen_baseline_table.py sees one
line per SF without re-running the whole leg.

Usage: tools/merge_probe_line.py LEG.json EXTRA.json [EXTRA2.json ...]
Rewrites LEG.json in place.
"""
import json, sys


def speed(line):
    return min([line["anchor"]] + list(line.get("anchors", [])))


def main():
    leg_path = sys.argv[1]
    leg = json.load(open(leg_path))
    for extra_path in sys.argv[2:]:
        extra = json.load(open(extra_path))
        scale = speed(leg) / speed(extra)
        for q, sec in extra["queries"].items():
            if q not in leg["queries"]:
                leg["queries"][q] = round(sec * scale, 2)
    leg["value"] = round(sum(leg["queries"].values()), 3)
    with open(leg_path, "w") as f:
        json.dump(leg, f, separators=(",", ":"))
    print(f"{leg_path}: {len(leg['queries'])} queries, anchor frame {speed(leg):.3f}")


if __name__ == "__main__":
    main()
