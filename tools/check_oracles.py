#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles: replicate the driver's
DuckDB compare (run oracle SQL over the same parquet tables, sort columns
by name, compare against the Verify parquet dump)."""
import duckdb, json, sys, math
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracles.items()):
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    try:
        sdf = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        fails.append((name, f"spark output missing: {e}"))
        continue
    # driver semantics: sort columns by name, then compare values
    oc, sc = sorted(odf.columns), sorted(sdf.columns)
    if oc != sc:
        fails.append((name, f"schema mismatch spark={sc} oracle={oc}"))
        continue
    odf, sdf = odf[oc].reset_index(drop=True), sdf[oc].reset_index(drop=True)
    if len(odf) != len(sdf):
        fails.append((name, f"row count spark={len(sdf)} oracle={len(odf)}"))
        continue
    diffs = []
    for c in oc:
        a, b = sdf[c], odf[c]
        try:
            # normalize timestamps/None
            if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                a = pd.to_datetime(a).astype("datetime64[us]")
                b = pd.to_datetime(b).astype("datetime64[us]")
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                i = int((~eq).idxmax())
                diffs.append(f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r} "
                             f"(+{int((~eq).sum())-1} more)")
        except Exception as e:
            diffs.append(f"col {c}: compare error {e}")
    if diffs:
        fails.append((name, "; ".join(diffs[:3])))
    else:
        print(f"OK   {name} ({len(sdf)} rows)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracles)-len(fails)}/{len(oracles)} oracles match")
sys.exit(1 if fails else 0)
