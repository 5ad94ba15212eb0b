#!/usr/bin/env python3
"""Same-host DuckDB timing of every oracle statement (dev tooling only —
the shipped Scala library never touches Python/DuckDB).

Usage: python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [runs]
         [--only=q1,q2] [--timeout=SECONDS]

--only narrows to named queries; --timeout interrupts a statement after N
seconds (the query records the elapsed time at interrupt as a CENSORED
lower bound, flagged in a "censored" list) — both for the scaling audit,
where a superlinear recursive CTE at a 10x scale factor must not own the
whole wall-clock budget.

Runs each oracle statement `runs` times (default 2, min-of-N per the
measurement discipline in BASELINE.md: DuckDB's recursive-CTE queries
vary ±50%, and engine/DuckDB runs must be SERIALIZED on this host, never
concurrent). Prints one JSON line shaped like graft.Bench's output:
{"metric":"duckdb_total_sec","value":N,"unit":"sec","queries":{...},"sf":...}
"""
import sys, os, json, time
import duckdb

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
    sf_dir = args[0]
    oracle_path = args[1]
    runs = int(args[2]) if len(args) > 2 else 2
    only = set(opts["only"].split(",")) if "only" in opts else None
    timeout = float(opts["timeout"]) if "timeout" in opts else None
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    names = sorted(n for n in oracle if only is None or n in only)
    best = {n: float("inf") for n in names}
    censored = set()
    # round-robin interleaved passes (same shape as graft.Bench) so host
    # drift within the run hits all queries evenly, not the tail
    import threading
    for _ in range(runs):
        for n in names:
            if n in censored:
                continue  # already hit the timeout once; don't re-pay it
            timer = None
            hit = []
            if timeout is not None:
                # interrupt BEFORE recording the hit so a non-empty
                # `hit` always implies the interrupt was actually
                # issued (the drain below keys off it)
                timer = threading.Timer(timeout,
                                        lambda: (con.interrupt(), hit.append(1)))
                timer.start()
            t0 = time.perf_counter()
            interrupted = False
            try:
                con.execute(oracle[n]).fetchall()
            except duckdb.InterruptException:
                interrupted = True
                censored.add(n)
                print(f"[censored] {n}: >= {timeout}s", file=sys.stderr)
            finally:
                if timer is not None:
                    timer.cancel()
                    # cancel() does not stop an ALREADY-RUNNING
                    # callback; join() waits it out, so after this
                    # line `hit` is final and any interrupt it issued
                    # has been issued
                    timer.join()
                    if hit and not interrupted:
                        # the timer fired in the race window AFTER
                        # fetchall() completed but BEFORE cancel(): a
                        # stale interrupt is pending on the connection
                        # and would abort the NEXT statement (which
                        # would then be wrongly censored with a
                        # near-zero time). Drain it on a trivial
                        # statement before moving on.
                        try:
                            con.execute("SELECT 1").fetchall()
                        except duckdb.InterruptException:
                            pass
            best[n] = min(best[n], time.perf_counter() - t0)
    total = sum(best.values())
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(json.dumps({
        "metric": "duckdb_total_sec", "value": round(total, 3),
        "unit": "sec", "runs": runs,
        "censored": sorted(censored),
        "queries": {n: round(best[n], 4) for n in names}, "sf": sf}))

if __name__ == "__main__":
    main()
