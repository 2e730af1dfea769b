#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ (Spark parquet) and <verifyOutDir>/oracle_sql.json,
runs each oracle SQL in DuckDB with views over <sfDir>/*.parquet, then
compares: schema (sorted column names), row count, and a value hash over
rows sorted by all columns. Exits non-zero if any oracle-backed query
mismatches. Queries without oracle SQL get a rows>0 check.
"""
import sys, os, json, glob, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_hash(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    canon_rows = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode("utf-8", "surrogateescape"))
        h.update(b"\x02")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark directory layout (part files)
            p = f"{p}/*.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"  {name}: NO OUTPUT"); failed.append(name); continue
        st = pq.read_table(files)
        s_names = st.column_names
        s_rows = [tuple(r) for r in zip(*(st.column(c).to_pylist() for c in s_names))] if st.num_rows else []
        if name not in oracles:
            ok = st.num_rows > 0
            print(f"  {name}: rows-only {'OK' if ok else 'EMPTY'} ({st.num_rows} rows)")
            if not ok:
                failed.append(name)
            continue
        try:
            res = con.execute(oracles[name])
            d_names = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"  {name}: ORACLE SQL ERROR: {e}"); failed.append(name); continue
        problems = []
        if sorted(s_names) != sorted(d_names):
            problems.append(f"schema spark={sorted(s_names)} duck={sorted(d_names)}")
        if st.num_rows != len(d_rows):
            problems.append(f"rows spark={st.num_rows} duck={len(d_rows)}")
        if not problems:
            hs, hd = table_hash(s_names, s_rows), table_hash(d_names, d_rows)
            if hs != hd:
                problems.append("hash mismatch")
                order_s = sorted(range(len(s_names)), key=lambda i: s_names[i])
                order_d = sorted(range(len(d_names)), key=lambda i: d_names[i])
                rs = sorted(tuple(r[i] for i in order_s) for r in s_rows)
                rd = sorted(tuple(r[i] for i in order_d) for r in d_rows)
                shown = 0
                for a, b in zip(rs, rd):
                    if tuple(map(canon, a)) != tuple(map(canon, b)) and shown < 3:
                        problems.append(f"    spark={a}")
                        problems.append(f"    duck ={b}")
                        shown += 1
        if problems:
            print(f"  {name}: FAIL " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            failed.append(name)
        else:
            print(f"  {name}: OK ({st.num_rows} rows)")
    n_or = len([q for q in oracles])
    print(f"== {len(failed)} failures; {n_or} oracle-backed queries ==")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
