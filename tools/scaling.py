#!/usr/bin/env python3
"""Emit the sf0.1 -> sf1 scaling table from two Bench JSON lines.

Usage: python3 tools/scaling.py BENCH_sf0.1.json BENCH_sf1.json [notes.md] > docs/SCALING.md

The optional third argument is a markdown file appended verbatim as a
"Notes" section — the place to pin watchlist analysis (isolated
re-timings, known adversarial-shape ratios) next to the numbers.

Each side accepts a comma-separated list of runs; per-query times are
min-merged across them (min is the standard low-noise estimator for
repeated wall-clock runs on a shared box — run-to-run variance at
local[32] is easily +/-30% on sub-second queries).

The committed artifact (docs/SCALING.md) makes *scaling* regressions —
not just wall-time regressions — visible every round: a query whose
10x-data ratio drifts above the documented bound shows up as a diff.
Dev tool only; runs driver-side (python3 is not a library dependency).
"""
import json
import sys


def load_one(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"metric"'):
                return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def load(paths):
    runs = [load_one(p) for p in paths.split(",")]
    merged = dict(runs[0])
    qs = {}
    for q in set().union(*(r["queries"].keys() for r in runs)):
        qs[q] = min(r["queries"][q] for r in runs if q in r["queries"])
    merged["queries"] = qs
    merged["value"] = sum(qs.values())
    merged["n_queries"] = len(qs)
    merged["n_errors"] = max(r["n_errors"] for r in runs)
    merged["n_runs"] = len(runs)
    return merged


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    rows = []
    for q in shared:
        ta, tb = qa[q], qb[q]
        # sub-100ms sf0.1 times are all JVM noise; ratio is meaningless
        ratio = tb / ta if ta >= 0.1 else None
        rows.append((q, ta, tb, ratio))
    rows.sort(key=lambda r: -(r[3] or 0))

    print("# Scaling: sf0.1 -> sf1 (10x data), full registry, same HEAD")
    print()
    iso = a.get("isolation") or b.get("isolation")
    if iso:
        print(f"- bench protocol: isolation = {iso} (r6-era numbers predate "
              "this and are not comparable for persist-heavy queries)")
    print(f"- sf0.1: {a['n_queries']} queries, {a['n_errors']} errors, "
          f"{a['value']:.1f} s total (per-query min of {a.get('n_runs', 1)} runs)")
    print(f"- sf1:   {b['n_queries']} queries, {b['n_errors']} errors, "
          f"{b['value']:.1f} s total (per-query min of {b.get('n_runs', 1)} runs; "
          f"{b['value']/a['value']:.2f}x total time on 10x data)")
    ratios = [r[3] for r in rows if r[3] is not None]
    over = [r for r in rows if r[3] is not None and r[3] > 8.0]
    print(f"- {len(ratios)} queries with a meaningful ratio "
          f"(sf0.1 time >= 0.1 s); {len(over)} above the 8x bound")
    print()
    print("| query | sf0.1 s | sf1 s | ratio at 10x data |")
    print("|---|---|---|---|")
    for q, ta, tb, ratio in rows:
        r = f"{ratio:.1f}x" if ratio is not None else "— (sf0.1 < 0.1 s)"
        print(f"| {q} | {ta:.2f} | {tb:.2f} | {r} |")
    if len(sys.argv) > 3:
        print()
        with open(sys.argv[3]) as f:
            print(f.read().rstrip())


if __name__ == "__main__":
    main()
