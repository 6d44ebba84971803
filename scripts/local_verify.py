#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped library is pure Scala/Spark; this script just lets the builder
iterate on oracle parity without waiting for the per-round driver run).

Usage: python3 scripts/local_verify.py <verifyOutDir> [sfDir]

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with views over
the sfDir parquet tables, and compares: sorted columns by name, sorted rows,
exact stringified value equality (intentionally strict — the query layer is
responsible for determinism via exact decimal arithmetic and rounding)."""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def key(row):
    return tuple(str(c) for c in row)

def norm_type(t):
    # benign cross-engine spellings collapse; HUGEINT does NOT collapse to
    # BIGINT on purpose — the driver hash is dtype-sensitive (round-11
    # graph_pagerank red was DuckDB SUM->HUGEINT vs Spark BIGINT with
    # identical values), so an oracle must CAST its derived columns.
    s = str(t).upper()
    return {"TIMESTAMP WITH TIME ZONE": "TIMESTAMP"}.get(s, s)

def compare(name, spark_rows, oracle_rows, spark_cols, oracle_cols,
            spark_types, oracle_types):
    if sorted(spark_cols) != sorted(oracle_cols):
        return f"SCHEMA cols differ: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
    st = {c: norm_type(t) for c, t in zip(spark_cols, spark_types)}
    ot = {c: norm_type(t) for c, t in zip(oracle_cols, oracle_types)}
    bad = [c for c in spark_cols if st[c] != ot[c]]
    if bad:
        return ("TYPE mismatch: " +
                ", ".join(f"{c}: spark={st[c]} oracle={ot[c]}" for c in bad))
    if len(spark_rows) != len(oracle_rows):
        return f"ROWS differ: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    # re-order columns by sorted name
    sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
    oidx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
    s = sorted((key([norm_cell(r[i]) for i in sidx]) for r in spark_rows))
    o = sorted((key([norm_cell(r[i]) for i in oidx]) for r in oracle_rows))
    for i, (a, b) in enumerate(zip(s, o)):
        if a != b:
            return f"VALUE mismatch at sorted-row {i}:\n  spark : {a}\n  oracle: {b}"
    return None

def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle_sql.items()):
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1  # partial SPARK_GRAFT_VERIFY_ONLY run
            continue
        try:
            sp = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols, spark_rows = sp.columns, sp.fetchall()
            spark_types = sp.types
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        try:
            orc = con.sql(sql)
            oracle_cols, oracle_rows = orc.columns, orc.fetchall()
            oracle_types = orc.types
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        err = compare(name, spark_rows, oracle_rows, spark_cols, oracle_cols,
                      spark_types, oracle_types)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
