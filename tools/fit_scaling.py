#!/usr/bin/env python3
"""Fit per-query scaling exponents from the bench JSONs the scaling ladder
produces (dev tooling only).

Usage: python3 tools/fit_scaling.py <dir>

Expects `<dir>/engine_sf{SF}.json` (graft.Bench artifacts) and
`<dir>/duckdb_sf{SF}.json` (tools/bench_duckdb.py output) for any subset of
SF in {0.001, 0.01, 0.1, 1}. For each query present at >=2 scale factors,
fits log(seconds) = a + b*log(sf) by least squares and reports b (the growth
exponent) per engine, plus the top-sf seconds.

Reading b: data volume grows ~linearly in sf, so b~1 is linear scaling, b~0
is a fixed floor (local-mode scheduling dominates — the per-query latency
that amortizes away on a cluster), b>1.2 is superlinear and needs a named
justification. The fit is only meaningful where seconds are well above the
floor; the report therefore also prints the floor-censored fit using only
points >= 3x the per-engine median floor at sf0.001.
"""
import sys, os, json, math

SFS = ["0.001", "0.01", "0.1", "1"]


def load(d, prefix):
    out = {}
    for sf in SFS:
        p = os.path.join(d, f"{prefix}_sf{sf}.json")
        if os.path.exists(p) and os.path.getsize(p) > 0:
            j = json.load(open(p))
            out[float(sf)] = {k: v for k, v in j["queries"].items() if v >= 0}
            out[float(sf)]["__censored__"] = set(j.get("censored", []))
    return out


def fit(points):
    """least-squares slope of log(t) on log(sf); None if <2 points"""
    pts = [(math.log(sf), math.log(t)) for sf, t in points if t > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    den = sum((x - mx) ** 2 for x, _ in pts)
    if den == 0:
        return None
    return sum((x - mx) * (y - my) for x, y in pts) / den


def main():
    d = sys.argv[1]
    eng = load(d, "engine")
    duck = load(d, "duckdb")
    names = sorted(set().union(*[set(v) for v in eng.values()]) - {"__censored__",
                                                                   "phase_index_build"})
    # engine floor estimate: median per-query seconds at the smallest sf
    # (almost everything there is pure scheduling)
    floor_sf = min(eng)
    floor = sorted(eng[floor_sf][n] for n in eng[floor_sf]
                   if n not in ("__censored__", "phase_index_build"))
    floor = floor[len(floor) // 2] if floor else 0.1
    rows = []
    for n in names:
        epts = [(sf, eng[sf][n]) for sf in sorted(eng) if n in eng[sf]]
        dpts = [(sf, duck[sf][n]) for sf in sorted(duck) if n in duck.get(sf, {})]
        dcens = any(n in duck[sf]["__censored__"] for sf in duck if n in duck[sf])
        b_e = fit(epts)
        # floor-censored engine fit: only points clearly above the floor
        b_ec = fit([(sf, t) for sf, t in epts if t >= 3 * floor])
        b_d = fit(dpts)
        rows.append((n, b_e, b_ec, b_d, dict(epts), dict(dpts), dcens))
    # report, sorted by floor-censored engine exponent desc
    print(f"{'query':36s} {'b_eng':>6s} {'b_eng>floor':>11s} {'b_duck':>7s} "
          f"{'eng@top':>8s} {'duck@top':>9s}")
    for n, b_e, b_ec, b_d, epts, dpts, dcens in sorted(
            rows, key=lambda r: -(r[2] if r[2] is not None else
                                  (r[1] if r[1] is not None else -9))):
        top_e = epts[max(epts)] if epts else float("nan")
        top_d = dpts[max(dpts)] if dpts else float("nan")
        cmark = ">=" if dcens else ""
        print(f"{n:36s} {b_e if b_e is not None else float('nan'):6.2f} "
              f"{b_ec if b_ec is not None else float('nan'):11.2f} "
              f"{b_d if b_d is not None else float('nan'):7.2f} "
              f"{top_e:8.2f} {cmark}{top_d:7.2f}")
    print(f"\nengine floor (median @ sf{floor_sf}): {floor:.3f}s; "
          f"floor-censored fit uses points >= {3*floor:.3f}s")


if __name__ == "__main__":
    main()
