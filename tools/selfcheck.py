#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate:
runs each oracle_sql.json entry in DuckDB over the sf parquet tables,
compares row count, column names (sorted), and value hash against the
Spark dump in outDir/<name>/ (parquet).
"""
import sys, json, glob, hashlib
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    # columns sorted by name; rows as-is (queries ORDER BY already);
    # floats rounded to 6 to absorb parquet float round-trip
    df = df[sorted(df.columns)]
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        for v in row:
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0: v = 0.0
            h.update(repr(v).encode())
        h.update(b"\n")
    return h.hexdigest(), len(df), list(df.columns)

fails = []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    sh, sn, sc = canon(spark_df)
    dh, dn, dc = canon(duck_df)
    if sc != dc:
        fails.append((name, f"schema: spark={sc} duck={dc}"))
    elif sn != dn:
        fails.append((name, f"rows: spark={sn} duck={dn}"))
    elif sh != dh:
        # find first differing row for debugging
        s2 = spark_df[sorted(spark_df.columns)].values.tolist()
        d2 = duck_df[sorted(duck_df.columns)].values.tolist()
        diff = next((i for i,(a,b) in enumerate(zip(s2,d2)) if repr(a)!=repr(b)), -1)
        detail = f" first diff row {diff}: spark={s2[diff]} duck={d2[diff]}" if diff>=0 else ""
        fails.append((name, "hash mismatch" + detail))
    else:
        print(f"PASS {name} ({sn} rows)")

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
