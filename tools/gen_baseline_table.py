#!/usr/bin/env python3
"""Generate the canonical current-state table for BASELINE.md (VERDICT r6
item 8): one row per registered query with its current sf0.1 cost, its
anchor-normalized sf1/sf10 scaling ratios where probed, and its posture
label (production vs labeled ground-truth audit baseline).

Inputs: a full-suite bench JSON line (sf0.1) and the scale-probe output
directory holding bench_sf01/bench_sf1/bench_sf10.json from the same boot.

Usage: tools/gen_baseline_table.py FULL_BENCH.json PROBE_DIR [ROUND]

ROUND (optional) stamps the emitted section header; the header travels
WITH the table so BASELINE.md's headline can never contradict its
contents again (VERDICT r10 item 6: the round-9 header sat above the
regenerated round-10 table for a full round).
"""
import os, sys

# Shared loader (ADVICE r7): compare_bench.load accepts a raw line, the
# driver's {"tail": ...} wrapper, AND a head-truncated fragment of either
# (reconstructed by regex) — the r07 wrapper's 2000-char tail starts
# mid-line, which the old fixed-pattern fallback could not recover.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare_bench import load as load_line


def main():
    full = load_line(sys.argv[1])
    probe_dir = sys.argv[2]
    p01 = load_line(f"{probe_dir}/bench_sf01.json")
    p1 = load_line(f"{probe_dir}/bench_sf1.json")
    p10 = load_line(f"{probe_dir}/bench_sf10.json")
    audit = set(full.get("audit", []))

    def speed(line, name="line"):
        # A line's machine-speed estimate: the FASTEST anchor observed in
        # that run. The headline "anchor" is measured at suite start on a
        # cold JVM and routinely reads 2-3x the flat mid-suite series
        # (r8 probe legs: headline 0.385 vs mid-suite 0.109) — consistent
        # with per-query min-of-3, the min anchor is the least-loaded
        # sample of the same instrument. A reconstructed fragment can have
        # lost both "anchor" and the "anchors" series — fail with a named
        # message instead of a bare KeyError (ADVICE r8).
        anchors = ([line["anchor"]] if "anchor" in line else []) \
            + list(line.get("anchors", []))
        if not anchors:
            sys.exit(f"no anchor recovered from fragment {name} — "
                     "anchor-normalized ratios are impossible; re-run that leg")
        return min(anchors)

    def norm_ratio(base, other):
        # anchor-normalize: seconds scale with machine speed; divide each
        # run by its own anchor before ratioing.
        out = {}
        for q, s in other["queries"].items():
            b = base["queries"].get(q)
            if b and b > 0:
                out[q] = (s / speed(other)) / (b / speed(base))
        return out

    r1 = norm_ratio(p01, p1)
    r10 = norm_ratio(p01, p10)
    # Keys merge_probe_line.py rescaled in from a DIFFERENT boot — marked
    # so the table never presents them as same-boot measurements (ADVICE
    # r8). The mark applies to the leg the key was merged into.
    merged1 = set(p1.get("merged", []))
    merged10 = set(p10.get("merged", []))
    merged_full = set(full.get("merged", []))

    rnd = sys.argv[3] if len(sys.argv) > 3 else "?"
    print(f"## Canonical per-query table (round {rnd}, "
          f"{len(full['queries'])} queries)")
    print()
    print("| query | sf0.1 s | sf1 ratio (10x) | sf10 ratio (100x) | posture |")
    print("|---|---|---|---|---|")
    for q in sorted(full["queries"], key=lambda x: (len(x), x)):
        sec = full["queries"][q]
        posture = "audit baseline" if q in audit else "production"
        c1 = (f"{r1[q]:.1f}x" + ("†" if q in merged1 else "")) if q in r1 else "—"
        c10 = (f"{r10[q]:.1f}x" + ("†" if q in merged10 else "")) if q in r10 else "—"
        c0 = f"{sec:.2f}" + ("†" if q in merged_full else "")
        print(f"| {q} | {c0} | {c1} | {c10} | {posture} |")
    print()
    print(f"(full-suite anchor {speed(full, 'full'):.3f}; probe anchors "
          f"sf0.1 {speed(p01, 'sf01'):.3f} / sf1 {speed(p1, 'sf1'):.3f} / "
          f"sf10 {speed(p10, 'sf10'):.3f}, same boot)")
    if merged1 or merged10 or merged_full:
        print("(† = merged from a separate boot by merge_probe_line.py, "
              "anchor-rescaled — not a same-boot measurement)")


if __name__ == "__main__":
    main()
