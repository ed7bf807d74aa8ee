#!/usr/bin/env python3
"""Emit the sf0.1 -> sf1 scaling table from two Bench JSON lines.

Usage: python3 tools/scaling.py BENCH_sf0.1.json BENCH_sf1.json [notes.md]
           [--retime SFDIR_SMALL SFDIR_BIG] > docs/SCALING.md

The optional notes argument is a markdown file appended verbatim as a
"Notes" section — the place to pin watchlist analysis (known
adversarial-shape ratios) next to the numbers.

Each side accepts a comma-separated list of runs; per-query times are
min-merged across them (min is the standard low-noise estimator for
repeated wall-clock runs on a shared box — run-to-run variance at
local[32] is easily +/-30% on sub-second queries).

--retime automates the isolated re-timing that used to be a hand-run
step: any in-table ratio above ISO_TRIGGER (6x) gets BOTH scale factors
re-run ALONE in a fresh JVM (SPARK_GRAFT_BENCH_FILTER pinned to the one
query), because a ratio measured inside a shared 350-query JVM can be
contaminated by cache pressure and JIT state from alphabetically earlier
queries (the round-7 lesson: a pure filter once showed a fake 76x). The
isolated ratio lands in its own column and the raw runs are written
under docs/bench/auto_iso_* for audit — zero hand-run files.

The committed artifact (docs/SCALING.md) makes *scaling* regressions —
not just wall-time regressions — visible every round: a query whose
10x-data ratio drifts above the documented bound shows up as a diff.
Dev tool only; runs driver-side (python3 is not a library dependency).
"""
import json
import os
import re
import subprocess
import sys

ISO_TRIGGER = 6.0  # in-table ratio above which an isolated re-time runs
# a committed run with fewer queries than this is a FILTER run (a late-added
# query benched alone): its times carry cold-JVM overhead on both sides, so
# in-table ratios from it overstate — such queries are auto-retimed isolated
# even when their in-table ratio is under ISO_TRIGGER
FULL_RUN_MIN = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
    src = {}  # per query: the LARGEST run (by query count) it appeared in
    for q in set().union(*(r["queries"].keys() for r in runs)):
        qs[q] = min(r["queries"][q] for r in runs if q in r["queries"])
        src[q] = max(len(r["queries"]) for r in runs if q in r["queries"])
    merged["queries"] = qs
    merged["src_run_size"] = src
    # per-phase sub-timings for the lifecycle chains (r15): min-merged
    # per (query, phase) across runs, same estimator as the query times
    ph = {}
    for r in runs:
        for q, m in (r.get("phases") or {}).items():
            t = ph.setdefault(q, {})
            for k, v in m.items():
                t[k] = min(v, t[k]) if k in t else v
    merged["phases"] = ph
    merged["value"] = sum(qs.values())
    merged["n_queries"] = len(qs)
    merged["n_errors"] = max(r["n_errors"] for r in runs)
    merged["n_runs"] = len(runs)
    merged["boots"] = sorted({r.get("boot") for r in runs if r.get("boot")})
    return merged


def retime_one(query, sfdir, out_path):
    """Run the single query alone in a fresh JVM; return its seconds.

    The filter is anchored (^name$): an unanchored regex would also match
    any query whose name contains this one as a substring, so the "alone
    in a fresh JVM" guarantee would silently not hold for prefix-named
    queries (x21 vs x210)."""
    env = dict(os.environ,
               SPARK_GRAFT_BENCH_FILTER=f"^{re.escape(query)}$")
    subprocess.run([os.path.join(REPO, "tools", "runbench.sh"),
                    sfdir, out_path, "24"],
                   env=env, check=True, capture_output=True, text=True)
    return load_one(out_path)["queries"][query]


def main():
    args = list(sys.argv[1:])
    retime_dirs = None
    reuse_iso = False
    allow_cross_boot = False
    if "--allow-cross-boot" in args:
        allow_cross_boot = True
        args.remove("--allow-cross-boot")
    if "--reuse-iso" in args:
        # reuse committed auto_iso_* runs for rows already re-timed this
        # round (each retime is a full fresh-JVM run; when only the table
        # assembly changed, re-running them is waste)
        reuse_iso = True
        args.remove("--reuse-iso")
    if "--retime" in args:
        i = args.index("--retime")
        retime_dirs = (args[i + 1], args[i + 2])
        del args[i:i + 3]
    a, b = load(args[0]), load(args[1])
    # boot-fingerprint guard (r12: a slower host boot showed as a uniform
    # fake 1.25x on identical code): a pair is ratio-comparable only when
    # the two sides share a boot. Refuse cross-boot pairs unless
    # explicitly overridden — and flag the override in the artifact.
    boots_a, boots_b = set(a.get("boots", [])), set(b.get("boots", []))
    cross_boot = bool(boots_a) and bool(boots_b) and not (boots_a & boots_b)
    if cross_boot and not allow_cross_boot:
        raise SystemExit(
            "refusing to pair cross-boot bench maps "
            f"(side A boots {sorted(boots_a)}, side B boots "
            f"{sorted(boots_b)}); rerun both sides on one boot, or pass "
            "--allow-cross-boot to emit a flagged table")
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    rows = []
    for q in shared:
        ta, tb = qa[q], qb[q]
        # sub-100ms sf0.1 times are all JVM noise; ratio is meaningless
        ratio = tb / ta if ta >= 0.1 else None
        rows.append((q, ta, tb, ratio))
    rows.sort(key=lambda r: -(r[3] or 0))

    iso_results = {}
    filter_sourced = set()
    if retime_dirs:
        # flag (a) in-table ratios over the trigger, and (b) queries whose
        # numbers on EITHER side come only from small filter runs (cold
        # single-query JVMs overstate in-table ratios — the r11 caveat rows)
        filter_sourced = {
            q for q in shared
            if min(a["src_run_size"].get(q, 0),
                   b["src_run_size"].get(q, 0)) < FULL_RUN_MIN}
        flagged = [r[0] for r in rows
                   if (r[3] is not None and r[3] > ISO_TRIGGER)
                   or r[0] in filter_sourced]
        iso_dir = os.path.join(REPO, "docs", "bench")
        os.makedirs(iso_dir, exist_ok=True)
        for q in flagged:
            try:
                p_small = os.path.join(iso_dir, f"auto_iso_{q}_small.json")
                p_big = os.path.join(iso_dir, f"auto_iso_{q}_big.json")
                if reuse_iso and os.path.exists(p_small) \
                        and os.path.exists(p_big):
                    t_small = load_one(p_small)["queries"][q]
                    t_big = load_one(p_big)["queries"][q]
                else:
                    t_small = retime_one(q, retime_dirs[0], p_small)
                    t_big = retime_one(q, retime_dirs[1], p_big)
                iso_results[q] = (t_small, t_big)
            except subprocess.CalledProcessError as e:
                print(f"<!-- isolated re-time of {q} FAILED: "
                      f"{e.stderr and e.stderr[-200:]} -->", file=sys.stderr)
            except KeyError:
                # the pinned query errored inside the bench run: it lands in
                # the run's errors map instead of queries — surface, not die
                print(f"<!-- isolated re-time of {q} FAILED: query errored "
                      "in the pinned bench run -->", file=sys.stderr)

    print("# Scaling: sf0.1 -> sf1 (10x data), full registry, same HEAD")
    print()
    iso = a.get("isolation") or b.get("isolation")
    if iso:
        print(f"- bench protocol: isolation = {iso} (r6-era numbers predate "
              "this and are not comparable for persist-heavy queries)")
    if cross_boot:
        print("- **CROSS-BOOT PAIR (flagged, --allow-cross-boot)**: the "
              f"two sides ran on different boots ({sorted(boots_a)} vs "
              f"{sorted(boots_b)}) — host-state drift can shift every "
              "ratio uniformly; treat totals and ratios as indicative only")
    elif boots_a or boots_b:
        same = sorted(boots_a | boots_b)
        print(f"- boot: {', '.join(same)} (sides share a boot — "
              "ratio-comparable)")
        if len(boots_a) > 1 or len(boots_b) > 1:
            print("- note: one side min-merges runs from MULTIPLE boots — "
                  "per-query mins may mix host states")
    else:
        print("- boot: unknown (maps predate the r13 boot fingerprint)")
    print(f"- sf0.1: {a['n_queries']} queries, {a['n_errors']} errors, "
          f"{a['value']:.1f} s total (per-query min of {a.get('n_runs', 1)} runs)")
    print(f"- sf1:   {b['n_queries']} queries, {b['n_errors']} errors, "
          f"{b['value']:.1f} s total (per-query min of {b.get('n_runs', 1)} runs; "
          f"{b['value']/a['value']:.2f}x total time on 10x data)")
    ratios = [r[3] for r in rows if r[3] is not None]
    over = [r for r in rows if r[3] is not None and r[3] > 8.0]
    print(f"- {len(ratios)} queries with a meaningful ratio "
          f"(sf0.1 time >= 0.1 s); {len(over)} above the 8x bound")
    if iso_results:
        print(f"- isolated column: in-table ratios above {ISO_TRIGGER}x were "
              "automatically re-timed ALONE in a fresh JVM per scale factor "
              "(shared-JVM ratios can be contaminated by the other ~350 "
              "queries' cache and JIT state); raw runs in docs/bench/auto_iso_*")
    if filter_sourced:
        print(f"- {len(filter_sourced)} queries whose committed numbers come "
              f"only from filter runs (< {FULL_RUN_MIN} queries in the run — "
              "cold-JVM times that overstate in-table ratios) were "
              "auto-retimed isolated regardless of their in-table ratio; "
              "their isolated column is the authoritative number")
    print()
    if iso_results:
        print("| query | sf0.1 s | sf1 s | ratio at 10x data | isolated |")
        print("|---|---|---|---|---|")
    else:
        print("| query | sf0.1 s | sf1 s | ratio at 10x data |")
        print("|---|---|---|---|")
    for q, ta, tb, ratio in rows:
        r = f"{ratio:.1f}x" if ratio is not None else "— (sf0.1 < 0.1 s)"
        if iso_results:
            if q in iso_results:
                ts, tb2 = iso_results[q]
                # an sf0.1 time that rounds to zero gives no meaningful
                # ratio (and would divide by zero)
                iso_r = f"{tb2/ts:.1f}x" if ts > 0 else "—"
                c = f"{iso_r} ({ts:.2f} s → {tb2:.2f} s)"
            else:
                c = "—"
            print(f"| {q} | {ta:.2f} | {tb:.2f} | {r} | {c} |")
        else:
            print(f"| {q} | {ta:.2f} | {tb:.2f} | {r} |")
    # lifecycle chains: per-phase split. The chain totals above price
    # build+maintain+serve as ONE number, which hides a serve-path
    # regression — and at 100 TB the serve rows are the latency-critical
    # signal while build/maintain are amortized background cost. The
    # serve-only ratio column is the proof the SERVE path (not just the
    # chain) stays sublinear at 10x data (r14 verdict #4).
    pa, pb = a.get("phases") or {}, b.get("phases") or {}
    chainq = sorted(set(pa) & set(pb))
    if chainq:
        print()
        print("## Lifecycle chains: per-phase split (serve-only ratios)")
        print()
        print("| query | phase | sf0.1 s | sf1 s | ratio at 10x data |")
        print("|---|---|---|---|---|")
        for q in chainq:
            for k in pa[q]:
                if k not in pb[q]:
                    continue
                ta, tb = pa[q][k], pb[q][k]
                r = f"{tb/ta:.1f}x" if ta >= 0.1 else "— (sf0.1 < 0.1 s)"
                print(f"| {q} | {k} | {ta:.2f} | {tb:.2f} | {r} |")

    notes = [p for p in args[2:] if not p.startswith("--")]
    if notes:
        print()
        with open(notes[0]) as f:
            print(f.read().rstrip())


if __name__ == "__main__":
    main()
