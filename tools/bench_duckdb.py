#!/usr/bin/env python3
"""Same-host DuckDB timing of every oracle statement (dev tooling only —
the shipped Scala library never touches Python/DuckDB).

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [runs]

Runs each oracle statement `runs` times (default 2, min-of-N per the
measurement discipline in BASELINE.md: DuckDB's recursive-CTE queries
vary ±50%, and engine/DuckDB runs must be SERIALIZED on this host, never
concurrent). Prints one JSON line shaped like graft.Bench's output:
{"metric":"duckdb_total_sec","value":N,"unit":"sec","queries":{...},"sf":...}
"""
import sys, os, json, time
import duckdb

def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    names = sorted(oracle)
    best = {n: float("inf") for n in names}
    # round-robin interleaved passes (same shape as graft.Bench) so host
    # drift within the run hits all queries evenly, not the tail
    for _ in range(runs):
        for n in names:
            t0 = time.perf_counter()
            con.execute(oracle[n]).fetchall()
            best[n] = min(best[n], time.perf_counter() - t0)
    total = sum(best.values())
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "duckdb_total_sec", "value": round(total, 3),
        "unit": "sec", "runs": runs,
        "queries": {n: round(best[n], 4) for n in names}, "sf": sf}))

if __name__ == "__main__":
    main()
