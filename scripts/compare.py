#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables and compare against the Spark
parquet output written by graft.Verify. Columns are sorted by name
before comparison (the driver's rule); rows are compared in produced
order. Usage: compare.py <sfdir> <verify_out_dir> [query ...]
"""
import sys, json, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and format stably
        if v == 0:
            v = 0.0
        return repr(round(v, 9))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            d_cols = [d[0] for d in duck_rel.description]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            results[name] = f"ERR {type(e).__name__}: {e}"
            continue
        if sorted(s_cols) != sorted(d_cols):
            results[name] = f"SCHEMA spark={sorted(s_cols)} duck={sorted(d_cols)}"
            continue
        s_ix = [s_cols.index(c) for c in sorted(s_cols)]
        d_ix = [d_cols.index(c) for c in sorted(d_cols)]
        if len(s_rows) != len(d_rows):
            results[name] = f"ROWS spark={len(s_rows)} duck={len(d_rows)}"
            continue
        bad = None
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            sv = [norm(sr[j]) for j in s_ix]
            dv = [norm(dr[j]) for j in d_ix]
            if sv != dv:
                bad = (i, dict(zip(sorted(s_cols), sv)), dict(zip(sorted(d_cols), dv)))
                break
        results[name] = "OK" if bad is None else f"VALUE row {bad[0]}: spark={bad[1]} duck={bad[2]}"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else "  " + str(v)[:400]))
    print(f"== {n_ok}/{len(results)} green ==")

if __name__ == "__main__":
    main()
