#!/usr/bin/env python3
"""Fold per-query floors into BENCH_BASELINE.json from one or more bench
result files (the full-JSON artifacts written via SPARK_GRAFT_BENCH_OUT).

Protocol (NOTES #54, #57d and the rewritten-query rule):
 - existing entries min-fold DOWN only;
 - queries listed in --reset take the MIN ACROSS THE GIVEN RUNS even if
   higher than the old floor (rewritten shape = new floor, with the old
   value recorded in the provenance note);
 - new queries enter at their min across runs.

usage: fold_floors.py --baseline BENCH_BASELINE.json --note "..." \
         [--reset q1,q2] run1.json [run2.json ...]
"""
import argparse, json, sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True)
    ap.add_argument("--note", required=True)
    ap.add_argument("--reset", default="")
    ap.add_argument("runs", nargs="+")
    a = ap.parse_args()

    base = json.load(open(a.baseline))
    floors = dict(base["queries"])
    reset = set(q for q in a.reset.split(",") if q)

    run_queries = []
    for path in a.runs:
        d = json.load(open(path))
        qs = d.get("queries")
        if not isinstance(qs, dict) or not qs:
            print(f"[fold] {path}: no queries map", file=sys.stderr)
            return 2
        run_queries.append(qs)
        missing = set(floors) - set(qs) - reset
        if missing:
            print(f"[fold] {path}: missing {sorted(missing)[:5]}...", file=sys.stderr)

    # a reset name absent from every run would silently keep its stale
    # floor (typo protection: the whole point of --reset is the reset)
    unmatched = reset - set().union(*[set(q) for q in run_queries])
    if unmatched:
        print(f"[fold] reset queries not in any run: {sorted(unmatched)}",
              file=sys.stderr)
        return 2

    folded_down, entered, reset_log = 0, 0, []
    names = set(floors) | set().union(*[set(q) for q in run_queries])
    for name in sorted(names):
        vals = [q[name] for q in run_queries if name in q]
        if not vals:
            continue
        best = min(vals)
        if name in reset:
            reset_log.append(f"{name} {floors.get(name, 'new')} -> {best}")
            floors[name] = best
        elif name not in floors:
            floors[name] = best
            entered += 1
        elif best < floors[name]:
            floors[name] = best
            folded_down += 1

    base["queries"] = floors
    base["value"] = round(sum(floors.values()), 3)
    base["provenance"] = base.get("provenance", "") + " | " + a.note
    if reset_log:
        base["provenance"] += " Resets: " + "; ".join(reset_log) + "."
    json.dump(base, open(a.baseline, "w"), indent=1)
    print(f"[fold] total {base['value']} over {len(floors)} queries; "
          f"{folded_down} folded down, {entered} new, {len(reset_log)} reset")
    for r in reset_log:
        print(f"[fold] reset: {r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
