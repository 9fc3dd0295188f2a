#!/usr/bin/env python3
"""Build a per-query-MIN composite bench floor from N capture files.

Usage: bench_composite.py OUT.json RUNS_NOTE CAP1.json [CAP2.json ...]

Each capture is a bench_latest.json-shaped dump ({runs, sf, total_sec,
queries, errors}). The composite takes the per-query MIN across captures,
re-sums the total, and refuses to proceed if any capture has errors or the
captures disagree on the query set. Also prints the pairwise capture-total
spread and the worst per-query regressions vs an optional --prev floor.
"""
import json, sys

def load(p):
    with open(p) as f:
        return json.load(f)

def main():
    args = sys.argv[1:]
    prev = None
    if "--prev" in args:
        i = args.index("--prev")
        prev = load(args[i + 1])
        del args[i:i + 2]
    out, note, caps_paths = args[0], args[1], args[2:]
    caps = [load(p) for p in caps_paths]
    names = set(caps[0]["queries"])
    for c, p in zip(caps, caps_paths):
        assert not c.get("errors"), f"{p} has errors: {c['errors']}"
        assert set(c["queries"]) == names, f"{p} query set differs"
        assert all(v is not None for v in c["queries"].values()), p
    comp = {n: min(c["queries"][n] for c in caps) for n in sorted(names)}
    total = round(sum(comp.values()), 3)
    totals = [c["total_sec"] for c in caps]
    print(f"capture totals: {totals} (spread "
          f"{(max(totals)/min(totals)-1)*100:.2f}%) -> composite {total}")
    if prev:
        pq = prev["queries"]
        regs = sorted(((comp[n] / pq[n], n) for n in names
                       if n in pq and pq[n] and pq[n] > 0.05),
                      reverse=True)
        print("worst vs prev floor:")
        for r, n in regs[:8]:
            print(f"  {n}: {pq[n]:.2f} -> {comp[n]:.2f}  ({r:.2f}x)")
        bad = [n for r, n in regs if r > 1.4]
        print(f">40% regressions: {len(bad)} {bad[:10]}")
    doc = {"runs": note, "sf": caps[0]["sf"], "total_sec": total,
           "queries": comp, "errors": []}
    with open(out, "w") as f:
        json.dump(doc, f)
    print(f"[composite] wrote {out}")

if __name__ == "__main__":
    main()
