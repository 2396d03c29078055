#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles: replicate the driver's
DuckDB compare (run oracle SQL over the same parquet tables, sort columns
by name, compare against the Verify parquet dump).

DTYPE-STRICT: the driver's hash is dtype-sensitive (a DuckDB HUGEINT
surfaces in pandas as float64 and hashes differently from Spark's int64
even when every value compares equal — this bit twice: r5 table_profile,
r10 chunk-pack family). So column dtypes must MATCH exactly after the
datetime normalization; a value-equal 3 vs 3.0 is a FAIL here, as it is
in the driver. `--selftest` proves that on a planted fixture.
"""
import duckdb, json, sys
import pandas as pd


def compare_frames(name, sdf, odf):
    """Return list of failure strings comparing a Spark dump to an oracle
    frame, mirroring the driver: sort columns by name, then require row
    count, per-column dtype, and per-value equality."""
    oc, sc = sorted(odf.columns), sorted(sdf.columns)
    if oc != sc:
        return [f"schema mismatch spark={sc} oracle={oc}"]
    odf, sdf = odf[oc].reset_index(drop=True), sdf[oc].reset_index(drop=True)
    if len(odf) != len(sdf):
        return [f"row count spark={len(sdf)} oracle={len(odf)}"]
    diffs = []
    for c in oc:
        a, b = sdf[c], odf[c]
        try:
            # normalize timestamps (tz/unit representation differs between
            # pyarrow and duckdb even for identical instants)
            if str(a.dtype).startswith("datetime") or str(b.dtype).startswith("datetime"):
                a = pd.to_datetime(a).astype("datetime64[us]")
                b = pd.to_datetime(b).astype("datetime64[us]")
            if str(a.dtype) != str(b.dtype):
                diffs.append(f"col {c} DTYPE spark={a.dtype} oracle={b.dtype}"
                             " (driver hash would reject even if values equal)")
                continue
            eq = (a.isna() & b.isna()) | (a == b)
            if not eq.all():
                i = int((~eq).idxmax())
                diffs.append(f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r} "
                             f"(+{int((~eq).sum())-1} more)")
        except Exception as e:
            diffs.append(f"col {c}: compare error {e}")
    return diffs


def selftest():
    """The checker must fail a value-equal int64-vs-float64 column (the
    HUGEINT escape class) and pass an identical-dtype twin."""
    s = pd.DataFrame({"k": pd.Series([1, 2], dtype="int64"),
                      "v": pd.Series([3, 4], dtype="int64")})
    o_bad = pd.DataFrame({"k": pd.Series([1, 2], dtype="int64"),
                          "v": pd.Series([3.0, 4.0], dtype="float64")})
    o_good = s.copy()
    bad = compare_frames("planted", s, o_bad)
    good = compare_frames("planted", s, o_good)
    assert bad and "DTYPE" in bad[0], f"selftest: dtype escape NOT caught: {bad}"
    assert not good, f"selftest: identical frames flagged: {good}"
    # datetime normalization must still tolerate unit differences
    s2 = pd.DataFrame({"t": pd.to_datetime(["2026-01-01"]).astype("datetime64[ns]")})
    o2 = pd.DataFrame({"t": pd.to_datetime(["2026-01-01"]).astype("datetime64[us]")})
    assert not compare_frames("ts", s2, o2), "selftest: ts unit normalization broken"
    print("selftest OK: planted 3-vs-3.0 dtype escape caught, "
          "identical frames pass, ts units normalized")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        sys.exit(0)

    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
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
        diffs = compare_frames(name, sdf, odf)
        if diffs:
            fails.append((name, "; ".join(diffs[:3])))
        else:
            print(f"OK   {name} ({len(sdf)} rows)")

    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(oracles)-len(fails)}/{len(oracles)} oracles match")
    sys.exit(1 if fails else 0)
