#!/usr/bin/env python3
"""Cross-check graft Verify dumps against the DuckDB oracle at one SF.

Mimics the driver: for each query with oracle SQL, run the SQL over the
sf parquet tables, sort columns by name, compare row count, schema
(column names), and a row-order-sensitive value hash.
"""
import sys, json, glob, hashlib
import duckdb, pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
oracle_sql = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    h = hashlib.sha256()
    for row in df.itertuples(index=False):
        h.update(("|".join(repr(v) for v in row)).encode())
    return h.hexdigest()

ok = fail = 0
for name in sorted(oracle_sql):
    spark_files = glob.glob(f"{out_dir}/{name}/part*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark dump"); fail += 1; continue
    # concat ALL part files in sorted filename order — part-00000 alone
    # would silently truncate a multi-part dump (ADVICE r7)
    s = pd.concat(
        [pd.read_parquet(f) for f in sorted(spark_files)], ignore_index=True)
    try:
        o = con.sql(oracle_sql[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fail += 1; continue
    if len(s) != len(o):
        print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); fail += 1; continue
    if sorted(s.columns) != sorted(o.columns):
        print(f"FAIL {name}: schema {sorted(s.columns)} vs {sorted(o.columns)}"); fail += 1; continue
    # normalize dtypes the way a hash compare tolerates: round-trip via repr
    # after aligning integer/float types
    s2, o2 = s[sorted(s.columns)].copy(), o[sorted(o.columns)].copy()
    for c in s2.columns:
        if str(s2[c].dtype).startswith(("int","uint")) and str(o2[c].dtype).startswith(("int","uint")):
            s2[c] = s2[c].astype("int64"); o2[c] = o2[c].astype("int64")
        elif "float" in str(s2[c].dtype) or "float" in str(o2[c].dtype):
            s2[c] = s2[c].astype("float64"); o2[c] = o2[c].astype("float64")
        elif "datetime" in str(s2[c].dtype) or "datetime" in str(o2[c].dtype):
            s2[c] = pd.to_datetime(s2[c]).astype("datetime64[us]")
            o2[c] = pd.to_datetime(o2[c]).astype("datetime64[us]")
    if canon(s2) != canon(o2):
        diff = (s2.reset_index(drop=True) != o2.reset_index(drop=True)).any(axis=1)
        print(f"FAIL {name}: hash mismatch, first diff rows:\n{s2[diff.values].head(2)}\n{o2[diff.values].head(2)}")
        fail += 1; continue
    ok += 1
# self-pinned queries (no external oracle): Verify computed the current
# canonical hash against the committed SelfPinned constant — report the
# verdicts so these rows are checked-against-pinned, not oracle-free
import os
sp_path = f"{out_dir}/self_pinned.json"
n_self = 0
if os.path.exists(sp_path):
    for name, v in sorted(json.load(open(sp_path)).items()):
        n_self += 1
        if v.get("match"):
            ok += 1
        else:
            print(f"FAIL {name}: self-pinned hash {v.get('got')} != {v.get('expected')}")
            fail += 1
print(f"RESULT {sf_dir}: {ok} OK, {fail} FAIL, "
      f"{len(oracle_sql)} oracle queries + {n_self} self-pinned")
sys.exit(1 if fail else 0)

# Sequential-flow contract: run `graft.Verify <sfdir> <outdir>` FIRST for
# the SAME sfdir (it refreshes the stable oracle mirrors under
# /tmp/graft_oracle_idx), THEN this script. Interleaving a Verify or test
# run for a DIFFERENT scale between the two steps leaves last-writer-wins
# mirrors for that other corpus and the index-backed checks will fail.
