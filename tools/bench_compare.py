#!/usr/bin/env python3
"""Per-query bench regression check: compare a current graft.Bench JSON
line against a stored baseline and flag queries that got materially
slower. Dev tool only.

Usage: python3 tools/bench_compare.py <baseline.json> <current.json>
       (each file: the one-line {"metric":"total",...} Bench output,
        possibly wrapped in sbt log prefixes — first '{' onward is used)

A query regresses if it is BOTH >1.5x slower and >0.3s absolute slower
(the machine is shared; small queries swing wildly run-to-run — see
NOTES.md).
"""
import sys, json

def load(path):
    line = open(path).read()
    return json.loads(line[line.index('{'):])

def main(base_path, cur_path):
    base, cur = load(base_path), load(cur_path)
    bq, cq = base["queries"], cur["queries"]
    bad = []
    for name, t in sorted(cq.items()):
        b = bq.get(name)
        if b is None:
            print(f"[new]  {name}: {t:.2f}s (no baseline)")
            continue
        if t > b * 1.5 and t - b > 0.3:
            bad.append((name, b, t))
    for name, b, t in sorted(bad, key=lambda x: x[1] - x[2]):
        print(f"[SLOW] {name}: {b:.2f}s -> {t:.2f}s ({t/b:.1f}x)")
    gone = sorted(set(bq) - set(cq))
    for name in gone:
        print(f"[gone] {name}: was {bq[name]:.2f}s, missing from current run")
    print(f"== total {base['value']:.1f}s -> {cur['value']:.1f}s; "
          f"{len(bad)} regressed / {len(cq)} queries ==")
    return 1 if bad or gone else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
