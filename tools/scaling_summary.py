#!/usr/bin/env python3
"""Summarize the scaling ladder for BASELINE.md (dev tooling only).

Usage: python3 tools/scaling_summary.py <dir>

Prints, for the heavy-query set present at sf1:
  engine sf0.1->sf1 growth ratio, DuckDB sf0.1->sf1 growth ratio
  (>= marks a censored DuckDB sf1 entry: the true value is larger),
plus totals per sf and the index-build ladder.
"""
import sys, os, json

d = sys.argv[1]


def load(prefix, sf):
    p = os.path.join(d, f"{prefix}_sf{sf}.json")
    if not os.path.exists(p) or os.path.getsize(p) == 0:
        return None
    return json.load(open(p))


sfs = ["0.001", "0.01", "0.1", "1"]
eng = {sf: load("engine", sf) for sf in sfs}
duck = {sf: load("duckdb", sf) for sf in sfs}

print("== totals (steady-state seconds; engine excludes the index phase) ==")
for sf in sfs:
    e = eng[sf]["value"] if eng[sf] else None
    v = duck[sf]["value"] if duck[sf] else None
    n_e = len([q for q in (eng[sf] or {}).get("queries", {}) if q != "phase_index_build"])
    cen = len((duck[sf] or {}).get("censored", []))
    print(f"  sf{sf:5s} engine {e if e is not None else '—':>8} ({n_e} queries)   "
          f"duckdb {v if v is not None else '—':>8}"
          f"{f' ({cen} censored at the timeout)' if cen else ''}")

print("\n== index-build ladder (one-time train phase) ==")
for sf in sfs:
    if eng[sf]:
        print(f"  sf{sf:5s} wall {eng[sf]['index_build_sec']:8.1f} s  "
              f"ingest {eng[sf]['ingest_sec']:6.1f} s")

if eng["1"] and duck["1"]:
    e1, e01 = eng["1"]["queries"], eng["0.1"]["queries"]
    d1, d01 = duck["1"]["queries"], duck["0.1"]["queries"]
    cens = set(duck["1"].get("censored", []))
    names = sorted((n for n in e1 if n != "phase_index_build" and n in e01),
                   key=lambda n: -e1[n])
    print("\n== heavy set: 10x data growth (sf0.1 -> sf1) ==")
    print(f"{'query':34s} {'eng@0.1':>8s} {'eng@1':>7s} {'xE':>5s} "
          f"{'duck@0.1':>9s} {'duck@1':>9s} {'xD':>6s}")
    for n in names:
        de0, de1 = d01.get(n), d1.get(n)
        xe = e1[n] / e01[n] if e01[n] > 0 else float("nan")
        xd = (de1 / de0) if (de0 and de1 and de0 > 0) else float("nan")
        c = ">=" if n in cens else "  "
        print(f"{n:34s} {e01[n]:8.2f} {e1[n]:7.2f} {xe:5.1f} "
              f"{de0 if de0 is not None else float('nan'):9.2f} "
              f"{c}{de1 if de1 is not None else float('nan'):7.2f} "
              f"{c}{xd:4.1f}")
    common = [n for n in names]
    te0 = sum(e01[n] for n in common)
    te1 = sum(e1[n] for n in common)
    td0 = sum(d01[n] for n in common if n in d01)
    td1 = sum(d1[n] for n in common if n in d1)
    print(f"\n  heavy-set totals: engine {te0:.1f} -> {te1:.1f} s "
          f"({te1/te0:.2f}x on 10x data); duckdb {td0:.1f} -> {td1:.1f} s "
          f"({td1/td0:.2f}x{', lower bound — censored entries' if cens else ''})")
