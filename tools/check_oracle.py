#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL from
oracle_sql.json in DuckDB over the sf parquet tables, compare against the
Verify parquet dumps (columns sorted by name, rows sorted, value-compare)."""
import sys, json, glob, math
import duckdb
import pyarrow.parquet as pq

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, bytes):
        return v.hex()
    return v

def normrow(row):
    return tuple(norm(v) for v in row)

fails, oks, rows_only = [], [], []
for name in sorted(glob.glob(f"{out_dir}/*/")):
    qname = name.rstrip("/").split("/")[-1]
    files = glob.glob(f"{name}/*.parquet")
    tbl = pq.read_table(files[0]) if files else None
    nrows = tbl.num_rows if tbl is not None else 0
    if qname not in oracle:
        rows_only.append((qname, nrows))
        if nrows == 0:
            fails.append((qname, "rows-only check: 0 rows"))
        continue
    try:
        got_cols = sorted(tbl.column_names)
        got = sorted((normrow(r) for r in zip(*[tbl.column(c).to_pylist() for c in got_cols])), key=repr)
        res = con.execute(oracle[qname])
        exp_names = [d[0] for d in res.description]
        exp_rows = res.fetchall()
        order = sorted(range(len(exp_names)), key=lambda i: exp_names[i])
        exp_cols = [exp_names[i] for i in order]
        exp = sorted((normrow(tuple(r[i] for i in order)) for r in exp_rows), key=repr)
        if got_cols != exp_cols:
            fails.append((qname, f"columns differ: spark={got_cols} duckdb={exp_cols}"))
        elif got != exp:
            diff = [(a, b) for a, b in zip(got, exp) if a != b][:3]
            extra = f" nrows spark={len(got)} duck={len(exp)}"
            fails.append((qname, f"values differ;{extra} first diffs: {diff}"))
        else:
            oks.append((qname, nrows))
    except Exception as e:
        fails.append((qname, f"oracle error: {e}"))

print(f"== OK ({len(oks)}):")
for q, n in oks:
    print(f"   {q} ({n} rows)")
print(f"== ROWS-ONLY ({len(rows_only)}):")
for q, n in rows_only:
    print(f"   {q} ({n} rows)")
print(f"== FAIL ({len(fails)}):")
for q, msg in fails:
    print(f"   {q}: {msg[:500]}")
sys.exit(1 if fails else 0)
