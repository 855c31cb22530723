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
    # Driver-strict: NO float rounding, NO -0.0 collapse. The oracle
    # strategy (decimal sums + round(...,4) in SQL on both sides) must
    # guarantee bit-equality; if it doesn't, this mirror must fail the
    # same way the driver's hash does.
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
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
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            s_cols = list(spark_rel.columns)
            s_types = [str(t) for t in spark_rel.types]
            s_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            d_cols = list(duck_rel.columns)
            d_types = [str(t) for t in duck_rel.types]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            results[name] = f"ERR {type(e).__name__}: {e}"
            continue
        if sorted(s_cols) != sorted(d_cols):
            results[name] = f"SCHEMA spark={sorted(s_cols)} duck={sorted(d_cols)}"
            continue
        # Driver-strict type check: the driver's hash is type-sensitive
        # (r3's q_win_session miss was HUGEINT-vs-BIGINT, invisible to
        # str()). Compare the DuckDB-visible type of every column.
        s_tmap = dict(zip(s_cols, s_types))
        d_tmap = dict(zip(d_cols, d_types))
        tbad = {c: (s_tmap[c], d_tmap[c]) for c in sorted(s_cols)
                if s_tmap[c] != d_tmap[c]}
        if tbad:
            results[name] = f"TYPE {tbad}"
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
