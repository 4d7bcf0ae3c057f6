#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the fixture parquet, compare against the Verify-dumped parquet
(exact values, columns sorted by name, rows in written order)."""
import json, sys, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
import glob
ok = fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING {name}"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{files[0]}'").df()
        want = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"ERROR   {name}: {str(e)[:200]}"); fail += 1; continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"COLS    {name}: got {list(got.columns)} want {list(want.columns)}"); fail += 1; continue
    # dtype parity: the driver hashes raw values, so an int64 Spark column vs
    # a HUGEINT/decimal DuckDB column (float64/object in pandas) is a FAIL
    # even when the numeric values coincide.
    dt_bad = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
              if str(got[c].dtype) != str(want[c].dtype)]
    if dt_bad:
        print(f"DTYPE   {name}: {dt_bad}"); fail += 1; continue
    if len(got) != len(want):
        print(f"ROWS    {name}: got {len(got)} want {len(want)}"); fail += 1; continue
    mismatch = None
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        for i, (g, w) in enumerate(zip(gv, wv)):
            same = (g == w) or (g is None and w is None)
            if not same:
                try:
                    if isinstance(g, float) and isinstance(w, float):
                        same = (math.isnan(g) and math.isnan(w)) or g == w
                    else:
                        same = str(g) == str(w)
                except Exception:
                    same = False
            if not same and not (g != g and w != w):  # NaN==NaN
                try:
                    if g is not None and w is not None and not isinstance(g, str):
                        if float(g) == float(w): same = True
                except Exception: pass
            if not same:
                # pandas None/NaN normalization
                gn = g is None or (isinstance(g, float) and math.isnan(g))
                wn = w is None or (isinstance(w, float) and math.isnan(w))
                if gn and wn: same = True
            if not same:
                mismatch = (c, i, g, w); break
        if mismatch: break
    if mismatch:
        c, i, g, w = mismatch
        print(f"VALUE   {name}: col={c} row={i} got={g!r} want={w!r}"); fail += 1
    else:
        print(f"OK      {name} ({len(got)} rows)"); ok += 1
# queries with no oracle: rows-only
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
