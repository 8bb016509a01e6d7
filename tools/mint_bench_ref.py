#!/usr/bin/env python3
"""Load-gated BENCH_REF mint (VERDICT r15 ask #5).

Usage: mint_bench_ref.py <candidate-bench.json> [--ref BENCH_REF.json]
                         [--max-before 4.0] [--max-after 8.0] [--force]

The per-query drift gate (check_bench_drift.py) divides out uniform
load shifts at READ time, but the committed reference itself must come
from a quiet run — a hot-machine reference poisons every later
comparison (round 15's reference was minted at load_avg_before 5.94 and
the round's drift adjudication paid for it). This script is the only
sanctioned refresh path: it refuses to copy the candidate run over
BENCH_REF.json unless the run's recorded load averages sit inside the
quiet band.

Band rationale (32-thread machine, Bench itself runs local[32]):
- load_avg_before is the 1-min load when the run STARTED — pure
  external signal; > 4.0 means something else was eating cores while
  the early (untimed-warmup) phase ran and likely bled into timing.
- load_avg_after includes Bench's own 32-thread work winding down, so
  the bar is looser; > 8.0 means a competing workload ran alongside
  (solo Bench lands ~3-5 on this machine, see BENCH_SCALARS.jsonl).

--force records the override visibly (prints MINT_FORCED) for the rare
deliberate hot-mint; don't use it to silence the gate.
"""
import argparse
import json
import shutil
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
    ap.add_argument("candidate")
    ap.add_argument("--ref", default="/root/repo/BENCH_REF.json")
    ap.add_argument("--max-before", type=float, default=4.0)
    ap.add_argument("--max-after", type=float, default=8.0)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    cand = load_bench(args.candidate)
    before = cand.get("load_avg_before")
    after = cand.get("load_avg_after")
    problems = []
    if before is None or after is None:
        problems.append("candidate run records no load_avg_before/after "
                        "(old bench protocol?) — rerun Bench")
    else:
        if before > args.max_before:
            problems.append(f"load_avg_before {before:.2f} > "
                            f"{args.max_before} (machine was hot when the "
                            f"run started)")
        if after > args.max_after:
            problems.append(f"load_avg_after {after:.2f} > "
                            f"{args.max_after} (a competing workload ran "
                            f"alongside Bench)")

    if problems and not args.force:
        for p in problems:
            print(f"HOT_MINT_REFUSED: {p}")
        print("wait for a quiet machine and rerun Bench, or --force "
              "(recorded) if the hot mint is deliberate")
        return 2
    if problems:
        for p in problems:
            print(f"MINT_FORCED despite: {p}")

    shutil.copyfile(args.candidate, args.ref)
    print(f"minted {args.ref} from {args.candidate} "
          f"(n_queries={cand.get('n_queries')}, "
          f"load before/after={before}/{after})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
