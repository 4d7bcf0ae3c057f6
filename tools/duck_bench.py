#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the fixture parquet — the
single-node-engine comparison line in README.md. Usage:
  python3 tools/duck_bench.py /root/testdata/sf0.1 /tmp/verify_out
(needs the oracle_sql.json dumped by graft.Verify in out_dir).

Regression gate:
  python3 tools/duck_bench.py --gate [bench.json]
Compares a current engine bench line (the one-line JSON printed by
`runMain graft.Bench`; default /tmp/bench_now.json) against the
committed per-query baseline tools/bench_baseline.json and exits
nonzero if any query's min-of-two time exceeds 2x its recorded
baseline AND 0.5s absolute (the floor keeps sub-0.2s scheduler jitter
from tripping the gate). Queries new since the baseline are listed but
never fail the gate; refresh the baseline alongside deliberate plan
changes."""
import json, os, sys, time


def gate(bench_path):
    base_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    base = json.load(open(base_path))["queries"]
    cur = json.load(open(bench_path))
    cur_q = cur["queries"] if "queries" in cur else cur
    bad, new = [], []
    for q, sec in sorted(cur_q.items()):
        if q not in base:
            new.append(q)
            continue
        if sec > 2.0 * base[q] and sec > 0.5:
            bad.append((q, sec, base[q]))
    for q, sec, b in bad:
        print(f"REGRESSION {q}: {sec:.3f}s vs baseline {b:.3f}s (>{2 * b:.3f}s)")
    if new:
        print(f"new since baseline (not gated): {', '.join(new)}")
    print(f"gate: {len(cur_q)} queries, {len(bad)} regressions")
    sys.exit(1 if bad else 0)


if len(sys.argv) > 1 and sys.argv[1] == "--gate":
    gate(sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_now.json")

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
