#!/usr/bin/env python3
"""Per-query bench drift gate (VERDICT r13 ask #2).

Usage: check_bench_drift.py <bench.json> [--ref BENCH_REF.json]
                            [--threshold 1.5] [--floor 0.15]

Compares a fresh Bench run's per-query seconds against the committed
single-run reference BENCH_REF.json (a full quiet Bench line at the
driver's config — 32 threads, sf0.1 — refreshed at each round end after
flags are adjudicated) and exits nonzero when any query drifted. Run-vs-
run is the only honest per-query comparison: BENCH_HISTORY's min-over-
all-runs accumulates unreproducible lows (older/smaller testdata, PlanCache
seam-order luck), so a gate against it flags half the board forever.

Load-noise guard: the documented machine-load band swings whole runs by
up to +-40% (see .claude/skills/verify/SKILL.md). A uniform shift is
load; a regression is ONE query moving relative to its peers. So each
query's ratio is divided by the run's median ratio first, and only this
load-normalized drift beyond --threshold AND --floor seconds absolute
(sub-0.15 s deltas are scheduler jitter) is gated. The raw median is
still printed so a reader can see how noisy the run was.
"""
import argparse
import json
import statistics
import sys


def load_bench(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if "queries" in d:
                return d
    raise SystemExit(f"no bench line with per-query times in {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench")
    ap.add_argument("--ref", default="/root/repo/BENCH_REF.json")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.15)
    ap.add_argument("--allow-new", action="store_true",
                    help="downgrade reference staleness (queries missing "
                         "from BENCH_REF.json) from a named failure to a "
                         "note — for mid-round iteration while new queries "
                         "land; the round-end refresh must clear it")
    args = ap.parse_args()

    bench = load_bench(args.bench)
    ref = {k: v for k, v in load_bench(args.ref)["queries"].items()
           if isinstance(v, (int, float)) and v > 0}

    ratios = {}
    for name, sec in bench["queries"].items():
        if name in ref:
            ratios[name] = sec / ref[name]
    if not ratios:
        raise SystemExit("no overlapping queries between bench and history")

    median_ratio = statistics.median(ratios.values())

    drifted = sorted(
        ((name, ref[name], bench["queries"][name], r / median_ratio)
         for name, r in ratios.items()
         if r / median_ratio > args.threshold
         and bench["queries"][name] - ref[name] * median_ratio > args.floor),
        key=lambda t: -t[3])

    # diagnostics FIRST (VERDICT r15 ADVICE): a run that is both stale
    # and drifted must still show the drift read on the overlapping
    # queries — returning 2 before printing forced a refresh-and-rerun
    # just to see the already-computed numbers.
    print(f"median per-query ratio vs committed reference run: "
          f"{median_ratio:.2f} (load-normalized drift gated at "
          f">{args.threshold}x of that)")
    if drifted:
        for name, old, newsec, rel in drifted:
            print(f"DRIFT: {name} {old:.3f}s ref -> {newsec:.3f}s "
                  f"({rel:.2f}x load-normalized)")
    else:
        print(f"OK: no query drifted >{args.threshold}x load-normalized "
              f"(+{args.floor}s floor) over {len(ratios)} compared")

    # staleness gate (VERDICT r14 ask #1, the PLANS_r* staleness rule):
    # the fresh run's key set IS the live query surface, so any query it
    # measures that the committed reference never saw is a named failure,
    # not a silent blind spot (q241 was invisible to this gate for a
    # round because the ref predated it).
    new = sorted(set(bench["queries"]) - set(ref))
    if new:
        msg = (f"{len(new)} measured queries missing from the committed "
               f"reference: {', '.join(new[:8])}"
               f"{'...' if len(new) > 8 else ''}")
        if args.allow_new:
            print(f"note: {msg}")
        else:
            print(f"STALE_REF: {msg}")
            print("refresh with: python3 tools/mint_bench_ref.py "
                  "BENCH_LOCAL.json (after adjudicating drift; the mint "
                  "is load-gated), or pass --allow-new mid-round")
            return 2
    return 1 if drifted else 0


if __name__ == "__main__":
    sys.exit(main())
