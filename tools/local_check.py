#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read each Verify
parquet dump, run the matching oracle SQL in DuckDB over the same
testdata tables, sort columns by name, and compare row counts, schema
shape and values. Usage: local_check.py <sfDir> <verifyOut>"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def values_equal(a, b):
    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    for c in a.columns:
        av, bv = a[c], b[c]
        for i in range(len(av)):
            x, y = av.iloc[i], bv.iloc[i]
            if x is None and y is None:
                continue
            try:
                if pd.isna(x) and pd.isna(y):
                    continue
            except (TypeError, ValueError):
                pass
            if isinstance(x, float) or isinstance(y, float):
                try:
                    xf, yf = float(x), float(y)
                except (TypeError, ValueError):
                    return False, f"col {c} row {i}: {x!r} vs {y!r}"
                if math.isnan(xf) and math.isnan(yf):
                    continue
                if xf != yf:
                    return False, f"col {c} row {i}: {x!r} != {y!r}"
            elif str(x) != str(y):
                return False, f"col {c} row {i}: {x!r} != {y!r}"
    return True, None

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO SPARK OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            results[name] = f"rows_only ({len(spark_df)})"
            continue
        try:
            ora_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        a, b = norm(spark_df), norm(ora_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA MISMATCH {list(a.columns)} vs {list(b.columns)}"
            continue
        ok, why = values_equal(a, b)
        results[name] = "OK" if ok else f"VALUE MISMATCH: {why}"
    width = max(len(n) for n in results)
    bad = 0
    for n, r in sorted(results.items()):
        flag = " " if (r == "OK" or r.startswith("rows_only")) else "*"
        if flag == "*":
            bad += 1
        print(f"{flag} {n:<{width}}  {r}")
    print(f"\n{len(results)} queries, {bad} failing")
    # engineless manifest consumer: if e16 ran, its exported cut
    # manifest must reproduce the cut with plain pyarrow (no JVM) —
    # the portability claim behind Engine.exportCutManifest
    if "e16_cut_manifest" in results and results["e16_cut_manifest"] == "OK":
        import re, subprocess, os
        san = re.sub(r"[^A-Za-z0-9]", "_", sf_dir)
        mans = sorted(glob.glob(f"/tmp/graft_cutman/{san}/cut_*.json"))
        if mans:
            rc = subprocess.call(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "read_cut_manifest.py"),
                 mans[-1], "--expect", f"{out_dir}/e16_cut_manifest"],
                stdout=subprocess.DEVNULL)
            print("pyarrow manifest reader:", "OK" if rc == 0 else "FAILED")
            if rc != 0:
                bad += 1
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
