#!/usr/bin/env python3
"""Load-gated BENCH_REF mint (VERDICT r15 ask #5).

Usage: mint_bench_ref.py <candidate-bench.json> [--ref BENCH_REF.json]
                         [--max-before 4.0] [--max-after 8.0]
                         [--history BENCH_HISTORY.json]
                         [--max-minsum-ratio 1.30] [--force]

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

Round-16 postmortem (VERDICT r16 ask #1): the load band alone is not
enough — r16's reference passed the load gate yet recorded
0.595 s/query where a run 90 minutes later measured 0.444, because the
1-min load average missed a decaying background workload. The second
gate below is load-INDEPENDENT: the candidate's measured total is
compared against the sum of per-query committed minimums in
BENCH_HISTORY.json (each query's best honest time ever recorded on
this machine). A clean quiet run lands 1.15-1.35x that sum (r16's
honest 118.5 s run was 1.27x its contemporaneous min-sum; mins are
per-query bests across MANY runs, so no single run reaches 1.0);
the r16 hot reference was 1.70x. The refusal band is 1.30x
(INFLATED_MINT_REFUSED) — above it the run is measurably inflated no
matter what the load averages claim. Bench updates BENCH_HISTORY
before the mint, so the denominator already includes any new mins the
candidate itself set.

--force records the override visibly (prints MINT_FORCED) for the rare
deliberate hot-mint; don't use it to silence the gate.
"""
import argparse
import json
import shutil
import sys


def load_bench(path):
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
        if "queries" in d:
            return d
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in d:
            return d
    raise SystemExit(f"no bench line with per-query times in {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("candidate")
    ap.add_argument("--ref", default="/root/repo/BENCH_REF.json")
    ap.add_argument("--max-before", type=float, default=4.0)
    ap.add_argument("--max-after", type=float, default=8.0)
    ap.add_argument("--history", default="/root/repo/BENCH_HISTORY.json")
    ap.add_argument("--max-minsum-ratio", type=float, default=1.30)
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

    # Load-independent inflation gate (r16 ask #1): compare the
    # candidate's total against the committed-min sum over the SAME
    # query set. Queries the history has never seen contribute their
    # candidate time to both sides (no penalty for being new).
    n_err = len(cand.get("errors") or [])
    if n_err:
        problems.append(f"candidate run recorded {n_err} query errors — "
                        f"a crashed/partial run is not a reference")
    try:
        with open(args.history) as f:
            hist = json.load(f)
    except OSError:
        hist = {}
    mins = {k: v for k, v in hist.items() if not k.startswith("_")}
    cand_q = cand.get("queries") or {}
    if cand_q:
        minsum = sum(min(mins[q], t) if q in mins else t
                     for q, t in cand_q.items())
        cand_total = sum(cand_q.values())
        ratio = cand_total / minsum if minsum > 0 else float("inf")
        print(f"minsum_check: candidate {cand_total:.1f}s vs "
              f"committed-min sum {minsum:.1f}s = {ratio:.3f}x "
              f"(band {args.max_minsum_ratio}x)")
        if ratio > args.max_minsum_ratio:
            problems.append(
                f"INFLATED_MINT_REFUSED: candidate total is {ratio:.2f}x "
                f"the committed-min sum (> {args.max_minsum_ratio}x) — "
                f"the run is measurably inflated regardless of load "
                f"averages; rerun on a quiet window")

    if problems and not args.force:
        for p in problems:
            print(p if p.startswith("INFLATED_MINT_REFUSED")
                  else f"HOT_MINT_REFUSED: {p}")
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
