#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, canonicalizes both sides (sort columns by name, sort
rows, stringify), and reports per-query match/mismatch.
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    out = df.map(norm)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # A query that threw inside Verify produces NO result directory; without
    # this cross-check a crashing query would silently vanish from the
    # comparison and the gate would still pass.
    names_path = os.path.join(out_dir, "query_names.json")
    expected = set(json.load(open(names_path))) if os.path.exists(names_path) \
        else set(oracles)
    present = {n for n in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, n))}
    n_ok = n_bad = n_skip = 0
    for name in sorted(expected - present):
        print(f"✗ {name}: NO RESULT (query crashed inside Verify)")
        n_bad += 1
    for name in sorted(present):
        d = os.path.join(out_dir, name)
        spark_df = pd.concat(
            [pd.read_parquet(os.path.join(d, f)) for f in os.listdir(d)
             if f.endswith(".parquet")], ignore_index=True)
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            n_skip += 1
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        # Driver-strict dtype gate: the driver's hash distinguishes int64
        # from float64 even when "%.9g" stringification collapses them
        # (e.g. DuckDB HUGEINT sums arrive as float64 through the pandas
        # bridge while Spark emits int64 — round-12's q248). Fail loudly
        # on an integer/float kind split BEFORE canonicalization erases
        # it. A float column holding NaN may just be pandas' nullable-int
        # carrier, so only a NaN-free float column triggers the gate.
        kind_bad = []
        for c in set(spark_df.columns) & set(oracle_df.columns):
            ka, kb = spark_df[c].dtype.kind, oracle_df[c].dtype.kind
            ints, flts = {"i", "u"}, {"f"}
            if (ka in ints and kb in flts and not oracle_df[c].isna().any()) \
                    or (kb in ints and ka in flts and not spark_df[c].isna().any()):
                kind_bad.append(f"{c}: spark={spark_df[c].dtype} oracle={oracle_df[c].dtype}")
        if kind_bad:
            print(f"✗ {name}: dtype kind mismatch (driver hash would differ): "
                  + "; ".join(kind_bad))
            n_bad += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"✗ {name}: column mismatch spark={list(a.columns)} oracle={list(b.columns)}")
            n_bad += 1
        elif len(a) != len(b):
            print(f"✗ {name}: row count spark={len(a)} oracle={len(b)}")
            n_bad += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"✗ {name}: value mismatch ({int(diff.sum())} rows); first diffs:")
            for i in idx:
                print(f"    spark : {a.loc[i].to_dict()}")
                print(f"    oracle: {b.loc[i].to_dict()}")
            n_bad += 1
        else:
            print(f"✓ {name}: {len(a)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad, {n_skip} rows-only ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
