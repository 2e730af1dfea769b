#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script loads
each <outDir>/<name> parquet, executes the matching oracle_sql.json
entry in DuckDB (testdata tables registered as views over <sfDir>),
sorts columns by name and rows by value, and compares exactly.

Usage: python3 tools/compare_oracle.py <sfDir> <outDir> [name_filter]
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object)
    # normalize date-like cells: parquet date32 loads as datetime.date,
    # duckdb DATE loads as Timestamp — same value, different python type
    def norm(v):
        if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
            return pd.Timestamp(v)
        return v
    df = df.map(norm)
    df = df.sort_values(by=list(df.columns), key=lambda s: s.map(repr)).reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if str(type(a)) != str(type(b)):
        # cross-engine dtype looseness: compare stringified values
        return str(a) == str(b)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    name_filter = sys.argv[3] if len(sys.argv) > 3 else ""
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name_filter and name_filter not in name:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(s)):
            for c in s.columns:
                if not cells_equal(s.at[i, c], d.at[i, c]):
                    bad = (i, c, s.at[i, c], d.at[i, c],
                           type(s.at[i, c]).__name__, type(d.at[i, c]).__name__)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]!r}: "
                  f"spark={bad[2]!r}({bad[4]}) duck={bad[3]!r}({bad[5]})")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
