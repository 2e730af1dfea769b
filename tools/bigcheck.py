#!/usr/bin/env python3
"""Streaming variant of check_scale's compare for entries whose RESULT
is itself huge (q95 at sf10: 380M matched pairs). check.py materializes
both result sets as Python tuples and hashes sorted rows — at 380M rows
that is ~100+ GB of Python objects and hours of single-threaded time.

This comparator never materializes rows outside DuckDB: it computes
  (row_count, SUM(hash(col_a::VARCHAR, col_b::VARCHAR, ...)))
with the columns in NAME-SORTED order (check.py's canonicalization) over
(a) the oracle SQL's result (CTEs staged as tables in a file-backed db,
same as check_scale --staged --dbfile) and (b) the Spark parquet dump,
and compares the aggregates. SUM of per-row 64-bit hashes is an
order-insensitive MULTISET digest — duplicate rows contribute
multiplicity — so it proves the same bag of rows, which is what the
sorted-row hash proves, minus only hash-collision resistance (two
differing multisets colliding on both count and 64-bit hash-sum).

Usage: bigcheck.py <sfDir> <verifyOutDir> <entry> [--mem L] [--tmp D]
       [--dbfile F] [--threads N]
Exit 0 on match, 1 on mismatch/error; prints one summary line.
"""
import sys, os, glob, json, argparse, shutil

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import TABLES
from check_scale import split_ctes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir"); ap.add_argument("out_dir"); ap.add_argument("entry")
    ap.add_argument("--mem", default="60GB")
    ap.add_argument("--tmp", default="target/duck_tmp_big")
    ap.add_argument("--dbfile", default="target/duck_big.db")
    ap.add_argument("--threads", default=os.environ.get("DUCK_THREADS", "16"))
    a = ap.parse_args()
    import duckdb
    for stale in (a.dbfile, a.dbfile + ".wal"):
        if os.path.exists(stale):
            os.remove(stale)
    if os.path.isdir(a.dbfile + ".tmp"):
        shutil.rmtree(a.dbfile + ".tmp", ignore_errors=True)
    con = duckdb.connect(a.dbfile)
    con.execute(f"SET threads={a.threads}")
    con.execute(f"SET memory_limit='{a.mem}'")
    os.makedirs(a.tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{a.tmp}'")
    for t in TABLES:
        p = f"{a.sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sql = json.load(open(f"{a.out_dir}/oracle_sql.json"))[a.entry]
    plan = split_ctes(sql)
    if plan:
        ctes, final = plan
        for name, body in ctes:
            con.execute(f'CREATE OR REPLACE TABLE "{name}" AS {body}')
            con.execute("CHECKPOINT")
        con.execute(f'CREATE OR REPLACE TABLE __oracle_res AS {final}')
    else:
        con.execute(f'CREATE OR REPLACE TABLE __oracle_res AS {sql}')
    con.execute("CHECKPOINT")
    d_types = dict(con.execute(
        "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_name='__oracle_res'").fetchall())
    cols = sorted(d_types)
    digest = ("count(*), sum(hash(" +
              ", ".join(f'CAST("{c}" AS VARCHAR)' for c in cols) + "))")
    d_n, d_h = con.execute(f"SELECT {digest} FROM __oracle_res").fetchone()
    spark_glob = f"{a.out_dir}/{a.entry}/*.parquet"
    s_types = dict(con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{spark_glob}')").fetchall())
    s_cols = sorted(s_types)
    if s_cols != cols:
        print(f"{a.entry}: SCHEMA MISMATCH spark={s_cols} duck={cols}")
        sys.exit(1)
    # types too: a DECIMAL-vs-DOUBLE divergence renders differently under
    # CAST AS VARCHAR and would otherwise surface as a confusing hashsum
    # mismatch; name the first differing column up front for triage
    type_diffs = [(c, s_types[c], d_types[c])
                  for c in cols if s_types[c] != d_types[c]]
    if type_diffs:
        c, st, dt = type_diffs[0]
        print(f"{a.entry}: WARNING type divergence on {len(type_diffs)} "
              f"column(s), first: \"{c}\" spark={st} duck={dt} — a hashsum "
              f"mismatch below is likely a VARCHAR-rendering artifact")
    s_n, s_h = con.execute(
        f"SELECT {digest} FROM read_parquet('{spark_glob}')").fetchone()
    ok = (d_n, d_h) == (s_n, s_h)
    print(f"{a.entry}: {'OK' if ok else 'FAIL'} rows spark={s_n} duck={d_n} "
          f"hashsum {'match' if s_h == d_h else f'spark={s_h} duck={d_h}'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
