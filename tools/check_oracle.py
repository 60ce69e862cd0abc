#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against DuckDB — mimics the
driver's t2 correctness gate: run Verify's parquet output vs the oracle SQL
on the same source tables, compare schema (sorted column names), row count,
and exact values (rows sorted)."""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    return con, oracle

def norm_cell(v):
    # Normalize across engines: Decimal -> normalized string, floats kept.
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("dt", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, bytearray):
        return ("b", bytes(v).hex())
    if isinstance(v, bytes):
        return ("b", v.hex())
    return v

def fetch_sorted(con, sql):
    res = con.sql(sql)
    cols = [c.lower() for c in res.columns]
    rows = res.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con, oracle = load(sf_dir, out_dir)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output at {pq}")
            n_fail += 1
            continue
        try:
            got_cols, got = fetch_sorted(con, f"SELECT * FROM '{pq}/*.parquet'")
            want_cols, want = fetch_sorted(con, sql)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        elif got != want:
            diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
            print(f"FAIL {name}: values differ, first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    rows_only = [d for d in os.listdir(out_dir)
                 if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle]
    for name in sorted(rows_only):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'").fetchone()[0] if files else 0
        print(f"{'ROWS' if n > 0 else 'EMPTY'} {name}: {n} rows (rows-only)")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
