#!/usr/bin/env python3
"""Bench drift report: compare a fresh bench_local.json against an
anchor (a saved copy or a git ref's version) and print the mover
adjudication table the round discipline requires.

Usage:
  scripts/drift.py <anchor.json> [new.json]      (new defaults to bench_local.json)
  scripts/drift.py --git <ref> [new.json]        (anchor from `git show ref:bench_local.json`)

Movers >1.3x (and >0.15s) in either direction are listed with their
deltas; the summary line gives the common-set ratio — the number the
round report quotes. Adjudication (touched-by-design vs machine noise)
stays a human step: check `git log -p` for the mover's code path and
BenchOne it next to an untouched neighbor.
"""
import sys, json, subprocess

args = sys.argv[1:]
if not args:
    sys.exit(__doc__)
if args[0] == "--git":
    anchor = json.loads(subprocess.check_output(
        ["git", "show", f"{args[1]}:bench_local.json"]))
    rest = args[2:]
else:
    anchor = json.load(open(args[0]))
    rest = args[1:]
new = json.load(open(rest[0] if rest else "bench_local.json"))

aq, nq = anchor["queries"], new["queries"]
common = sorted(set(aq) & set(nq))
ratio = sum(nq[k] for k in common) / sum(aq[k] for k in common)
print(f"anchor: {len(aq)} queries {sum(aq.values()):.1f}s | "
      f"new: {len(nq)} queries {sum(nq.values()):.1f}s | "
      f"common {len(common)} ratio {ratio:.3f}x")

ups = [(k, aq[k], nq[k]) for k in common
       if nq[k] > 1.3 * aq[k] and nq[k] > 0.15]
downs = [(k, aq[k], nq[k]) for k in common
         if nq[k] < 0.7 * aq[k] and aq[k] > 0.15]
for title, rows, key in (("UP >1.3x (adjudicate each)", ups, lambda r: -r[2] / r[1]),
                         ("DOWN <0.7x (context for swing signature)", downs, lambda r: r[2] / r[1])):
    print(f"\n{title}: {len(rows)}")
    for k, a, n in sorted(rows, key=key):
        print(f"  {k}: {a:.3f} -> {n:.3f} ({n / a:.2f}x)")
added = sorted(set(nq) - set(aq))
if added:
    print(f"\nnew queries: " + ", ".join(f"{k}={nq[k]:.2f}s" for k in added))
removed = sorted(set(aq) - set(nq))
if removed:
    print(f"\nREMOVED (explain or restore): {removed}")
