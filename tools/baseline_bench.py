#!/usr/bin/env python3
"""Single-node baselines for BASELINE.md.

1. Export proxy: the reference (neo4j_export.py) collects every node/rel to
   the driver and writes CSVs single-threaded with csv.DictWriter
   (restval='NULL'). Reproduce that writer loop on the same tables/volumes
   the graft flagship exports (g_model_mappings), minus the Neo4j server.
2. Query baseline: DuckDB (single node, multithreaded) running each oracle
   SQL from oracle_sql.json over the same parquet.
"""
import csv, io, json, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else None

con = duckdb.connect()
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

# --- 1. reference-shaped export: driver collect + csv.DictWriter ---------
node_tables = ["region", "nation", "customer", "supplier", "part", "orders"]
rel_selects = {  # same rel tables the engine exports (endpoint columns + props)
    "Nation_IN_REGION_Region": "SELECT n_nationkey, n_regionkey FROM nation",
    "Customer_IN_NATION_Nation": "SELECT c_custkey, c_nationkey FROM customer",
    "Supplier_LOCATED_IN_Nation": "SELECT s_suppkey, s_nationkey FROM supplier",
    "Customer_PLACED_Order": "SELECT o_custkey, o_orderkey FROM orders",
    "Order_CONTAINS_Part": ("SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, "
                            "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM lineitem"),
    "Order_SUPPLIED_BY_Supplier": "SELECT l_orderkey, l_suppkey, l_linenumber, l_quantity FROM lineitem",
}
t0 = time.time()
n_rows = 0
for name, sql in [(t, f"SELECT * FROM {t}") for t in node_tables] + list(rel_selects.items()):
    cur = con.sql(sql)
    cols = [d[0] for d in cur.description]
    buf = io.StringIO()  # in-memory: disk is NOT the reference's bottleneck
    w = csv.DictWriter(buf, fieldnames=cols, restval="NULL")
    w.writeheader()
    for row in cur.fetchall():  # driver-side collect, like the reference
        w.writerow({c: ("NULL" if v is None else v) for c, v in zip(cols, row)})
        n_rows += 1
export_s = time.time() - t0

out = {"export_proxy": {"seconds": round(export_s, 2), "rows": n_rows,
                        "rows_per_sec": int(n_rows / export_s)}}

# --- 2. DuckDB on the oracle SQL -----------------------------------------
if oracle_path:
    oracles = json.load(open(oracle_path))
    times = {}
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:
            times[name] = f"err: {e}"[:60]
    out["duckdb_oracle"] = {"total_sec": round(sum(v for v in times.values() if isinstance(v, float)), 2),
                            "queries": times}
print(json.dumps(out, indent=1))
