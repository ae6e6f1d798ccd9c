#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the declared DuckDB oracle SQL over the
same sf tables and compare (column-name-sorted, row-sorted, exact values).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, then rows; floats normalized via repr
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    import decimal, datetime
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    result_dirs = sorted(d for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d))
    for d in result_dirs:
        name = os.path.basename(d)
        got = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        gcols = [c[0] for c in got.description]
        grows = got.fetchall()
        if name not in oracle:
            n_noracle += 1
            print(f"  [no-oracle] {name}: {len(grows)} rows")
            continue
        try:
            exp = con.execute(oracle[name])
            ecols = [c[0] for c in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            continue
        gc, gv = canon(grows, gcols)
        ec, ev = canon(erows, ecols)
        if gc != ec:
            n_fail += 1
            print(f"  [FAIL-cols] {name}: spark={gc} duckdb={ec}")
        elif gv != ev:
            n_fail += 1
            diff = [(a, b) for a, b in zip(gv, ev) if a != b][:3]
            extra = f" rowcount spark={len(gv)} duckdb={len(ev)}"
            print(f"  [FAIL-vals] {name}:{extra} first diffs: {diff}")
        else:
            n_pass += 1
            print(f"  [ok       ] {name}: {len(gv)} rows")
    print(f"PASS={n_pass} FAIL={n_fail} NO_ORACLE={n_noracle}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
