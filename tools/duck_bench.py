#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the fixture parquet — the
single-node-engine comparison line in README.md. Usage:
  python3 tools/duck_bench.py /root/testdata/sf0.1 /tmp/verify_out
(needs the oracle_sql.json dumped by graft.Verify in out_dir)."""
import json, sys, time
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
times = {}
errors = []
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.execute(oracle[name]).fetchall()
        times[name] = time.time() - t0
    except Exception as e:
        errors.append(name)
        print(f"ERROR {name}: {str(e)[:120]}", file=sys.stderr)
print(json.dumps({"total": round(sum(times.values()), 1),
                  "n_ok": len(times), "n_err": len(errors), "errors": errors,
                  "queries": {k: round(v, 3) for k, v in times.items()}}))
