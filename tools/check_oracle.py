#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tooling only —
the shipped Scala library never touches Python/DuckDB).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB with every
testdata table registered as a view, and compares: row count, column
names, and a canonicalized value hash (columns sorted by name, rows
sorted, floats rounded to 6 significant-ish decimals, timestamps to
microseconds).
"""
import sys, os, json, glob, math
import duckdb

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    # timestamps -> isoformat microseconds
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no parquet written")
            fail += 1
            continue
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        gcols = [c[0] for c in got.description]
        grows = got.fetchall()
        if name not in oracle:
            print(f"[ROWS-ONLY] {name}: {len(grows)} rows (no oracle)")
            ok += 1
            continue
        try:
            exp = con.execute(oracle[name])
            ecols = [c[0] for c in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            fail += 1
            continue
        problems = []
        if sorted(gcols) != sorted(ecols):
            problems.append(f"cols {sorted(gcols)} != {sorted(ecols)}")
        if len(grows) != len(erows):
            problems.append(f"rows {len(grows)} != {len(erows)}")
        if not problems and table_hash(gcols, grows) != table_hash(ecols, erows):
            problems.append("hash mismatch")
            # show first differing canonical line
            o1 = sorted(range(len(gcols)), key=lambda i: gcols[i])
            o2 = sorted(range(len(ecols)), key=lambda i: ecols[i])
            l1 = sorted("|".join(canon(r[i]) for i in o1) for r in grows)
            l2 = sorted("|".join(canon(r[i]) for i in o2) for r in erows)
            for a, b in zip(l1, l2):
                if a != b:
                    problems.append(f"  got: {a}\n  exp: {b}")
                    break
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"[OK]   {name}: {len(grows)} rows")
            ok += 1
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)

main()
