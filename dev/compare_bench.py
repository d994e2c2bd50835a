#!/usr/bin/env python3
"""Diff two Bench JSON artifacts and flag real per-query regressions.

Usage: python3 dev/compare_bench.py <old.json> <new.json> [ratio]

Single-run timings on this box swing 2-3x per query (see Bench.scala),
so a naive old-vs-new diff cries wolf every round (r5 q_dedup_simhash,
r7 q_dedup_ngram_jaccard were both noise). This reports only queries
slower by more than `ratio` (default 3.0) AND by more than 0.5 s
absolute — candidates to re-measure with SPARK_GRAFT_BENCH_RUNS=3, not
verdicts. Dev-only tool.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {}), d.get("value")


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    old, old_total = load(old_path)
    new, new_total = load(new_path)
    common = sorted(set(old) & set(new))
    print(f"old total {old_total:.1f}s ({len(old)} queries), "
          f"new total {new_total:.1f}s ({len(new)} queries), "
          f"{len(common)} common")
    added = sorted(set(new) - set(old))
    gone = sorted(set(old) - set(new))
    if added:
        print("added:", ", ".join(added))
    if gone:
        print("removed:", ", ".join(gone))
    flagged = []
    for q in common:
        if new[q] > old[q] * ratio and new[q] - old[q] > 0.5:
            flagged.append((new[q] / old[q], old[q], new[q], q))
    for r, o, n, q in sorted(flagged, reverse=True):
        print(f"REGRESSION? {q}: {o:.2f}s -> {n:.2f}s ({r:.1f}x) "
              f"— re-measure with SPARK_GRAFT_BENCH_RUNS=3 before believing")
    if not flagged:
        print("no per-query regressions past the noise band "
              f"(>{ratio}x and >0.5s)")


if __name__ == "__main__":
    main()
