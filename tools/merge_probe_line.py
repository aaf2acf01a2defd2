#!/usr/bin/env python3
"""Merge per-query entries from a standalone bench line into a probe-leg
bench line, rescaling seconds into the target leg's machine-speed frame
(sec * leg_anchor / source_anchor, anchors = fastest observed per run).
Used when a query is probed separately from its SF leg (e.g. a
registration added after the leg ran) so gen_baseline_table.py sees one
line per SF without re-running the whole leg.

Merged keys are recorded in the rewritten line's "merged" array (ADVICE
r8): the rescaled numbers come from a DIFFERENT boot than the leg's, and
downstream readers (gen_baseline_table.py marks these rows) must be able
to tell measured-in-leg from cross-boot rescaled.

Usage: tools/merge_probe_line.py LEG.json EXTRA.json [EXTRA2.json ...]
Rewrites LEG.json in place.
"""
import json, sys


def speed(line, path):
    anchors = ([line["anchor"]] if "anchor" in line else []) + list(line.get("anchors", []))
    if not anchors:
        sys.exit(f"no anchor recovered from {path} — cannot rescale across boots")
    return min(anchors)


def main():
    leg_path = sys.argv[1]
    leg = json.load(open(leg_path))
    merged = set(leg.get("merged", []))
    for extra_path in sys.argv[2:]:
        extra = json.load(open(extra_path))
        scale = speed(leg, leg_path) / speed(extra, extra_path)
        for q, sec in extra["queries"].items():
            if q not in leg["queries"]:
                leg["queries"][q] = round(sec * scale, 2)
                merged.add(q)
    if merged:
        leg["merged"] = sorted(merged)
    leg["value"] = round(sum(leg["queries"].values()), 3)
    with open(leg_path, "w") as f:
        json.dump(leg, f, separators=(",", ":"))
    print(f"{leg_path}: {len(leg['queries'])} queries "
          f"({len(merged)} cross-boot rescaled), anchor frame {speed(leg, leg_path):.3f}")


if __name__ == "__main__":
    main()
