#!/usr/bin/env python3
"""Scale-corpus variant of check.py: same rows+schema+value-hash compare
against the DuckDB oracle, but each entry runs in its OWN subprocess with
a wall timeout and a bounded DuckDB memory/temp budget, so one quadratic
oracle (the known O(n^2) kernels at 10x/100x) cannot stall or disk-fill
the whole sweep. Results are aggregated to a JSON report.

Usage:
  python3 tools/check_scale.py <sfDir> <verifyOutDir> \
      [--timeout SEC] [--mem LIMIT] [--tmp DIR] [--tmp-size LIMIT] \
      [--only a,b] [--skip a,b] [--json report.json]

Child mode (internal): ... --entry NAME  -> one compare, exit 0/1.
"""
import sys, os, json, glob, time, argparse, subprocess, shutil, re

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import table_hash, TABLES


def split_ctes(sql):
    """Split a `WITH a AS (...), b AS (...) SELECT ...` into its
    top-level CTEs and the final statement, paren- and string-aware.
    For WITH RECURSIVE, the maximal flat PREFIX of CTEs is staged and
    the tail (from the first self-referencing CTE on) is re-wrapped as
    an inline WITH RECURSIVE over the staged temp tables. Returns
    (ctes, final) or None when nothing is stageable."""
    s = sql.strip()
    m = re.match(r"(?is)^WITH\s+(RECURSIVE\s+)?", s)
    if not m:
        return None
    recursive = bool(m.group(1))
    i, n, ctes = m.end(), len(s), []
    while True:
        m2 = re.match(
            r"(?is)\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*"
            r"(?:NOT\s+MATERIALIZED\s*|MATERIALIZED\s*)?\(", s[i:])
        if not m2:
            return None
        name, j = m2.group(1), i + m2.end()
        depth, k = 1, j
        while depth > 0 and k < n:
            c = s[k]
            if c == "'":
                k += 1
                while k < n:
                    if s[k] == "'":
                        if k + 1 < n and s[k + 1] == "'":
                            k += 2; continue
                        break
                    k += 1
            elif c == '"':
                # double-quoted identifier: opaque ("" escapes a quote)
                k += 1
                while k < n:
                    if s[k] == '"':
                        if k + 1 < n and s[k + 1] == '"':
                            k += 2; continue
                        break
                    k += 1
            elif c == "-" and k + 1 < n and s[k + 1] == "-":
                # -- line comment: skip to end of line (an apostrophe or
                # unbalanced paren inside it must not affect the scan)
                while k < n and s[k] != "\n":
                    k += 1
                continue
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        if depth != 0:
            return None
        body = s[j:k - 1]
        # a CTE shadowing a base table breaks sequential temp-table
        # semantics (its own body would read the temp table, not the
        # view); self-reference is impossible in a non-RECURSIVE WITH
        if name in TABLES:
            return None
        ctes.append((name, body))
        m3 = re.match(r"\s*,", s[k:])
        if m3:
            i = k + m3.end(); continue
        final = s[k:].strip()
        break
    if not recursive:
        return ctes, final
    # RECURSIVE: stage the flat prefix; keep everything from the first
    # genuinely self-referencing CTE onward inline (FROM/JOIN self-ref
    # is how recursion appears; column-name collisions are harmless
    # false positives that only shorten the staged prefix)
    cut = len(ctes)
    names = [nm for nm, _ in ctes]
    for idx, (nm, bd) in enumerate(ctes):
        # cut at self-reference OR at a forward reference to a CTE
        # defined later in the list (mutual recursion is legal under
        # WITH RECURSIVE; staging such a prefix would CREATE TABLE
        # against a not-yet-existing name)
        later = names[idx:]
        if any(re.search(rf"(?is)\b(from|join)\s+{ln}\b", bd)
               for ln in later):
            cut = idx; break
    if cut == 0:
        return None
    staged, tail = ctes[:cut], ctes[cut:]
    if tail:
        final = ("WITH RECURSIVE " +
                 ", ".join(f"{nm} AS ({bd})" for nm, bd in tail) +
                 " " + final)
    return staged, final


def run_oracle(con, sql, staged, on_disk=False):
    """Execute the oracle; with staged=True, materialize each top-level
    CTE as a TEMP TABLE first so DuckDB holds one stage's pipeline at a
    time instead of the whole CTE DAG (the sf10 memory/temp-cap fix).
    With on_disk=True the stages are persistent tables in a file-backed
    database (the connection must be file-backed), which DuckDB flushes
    to disk under memory pressure — TEMP tables prefer memory."""
    plan = split_ctes(sql) if staged else None
    if plan is None:
        return con.execute(sql)
    ctes, final = plan
    kind = "TABLE" if on_disk else "TEMP TABLE"
    for name, body in ctes:
        con.execute(f'CREATE OR REPLACE {kind} "{name}" AS {body}')
        if on_disk:
            con.execute("CHECKPOINT")
    return con.execute(final)


def compare_one(sf_dir, out_dir, name, mem, tmp, tmp_size, staged=False,
                dbfile=""):
    import duckdb
    import pyarrow.parquet as pq
    # a timed-out child killed mid-stage leaves a WAL (and possibly a
    # .tmp spill dir) next to the dbfile; a fresh database beside a stale
    # WAL can fail replay and surface as a spurious oracle_error
    if dbfile:
        for stale in (dbfile, dbfile + ".wal"):
            if os.path.exists(stale):
                os.remove(stale)
        if os.path.isdir(dbfile + ".tmp"):
            shutil.rmtree(dbfile + ".tmp", ignore_errors=True)
    con = duckdb.connect(dbfile) if dbfile else duckdb.connect()
    con.execute(f"SET threads={os.environ.get('DUCK_THREADS', '8')}")
    con.execute(f"SET memory_limit='{mem}'")
    if tmp:
        # spill into a DEDICATED subdirectory of --tmp: the parent
        # loop's per-entry cleanup removes spill/ wholesale, so --tmp
        # itself may safely be a shared location (/tmp, the dbfile's
        # directory) without the cleanup destroying unrelated files
        spill = os.path.join(tmp, "spill")
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET temp_directory='{spill}'")
        con.execute(f"SET max_temp_directory_size='{tmp_size}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"  {name}: NO OUTPUT"); return 1
    st = pq.read_table(files)
    s_names = st.column_names
    s_rows = [tuple(r) for r in zip(*(st.column(c).to_pylist() for c in s_names))] if st.num_rows else []
    if name not in oracles:
        ok = st.num_rows > 0
        print(f"  {name}: rows-only {'OK' if ok else 'EMPTY'} ({st.num_rows} rows)")
        return 0 if ok else 1
    try:
        res = run_oracle(con, oracles[name], staged, on_disk=bool(dbfile))
        d_names = [c[0] for c in res.description]
        d_rows = res.fetchall()
    except Exception as e:
        print(f"  {name}: ORACLE SQL ERROR: {e}"); return 1
    problems = []
    if sorted(s_names) != sorted(d_names):
        problems.append(f"schema spark={sorted(s_names)} duck={sorted(d_names)}")
    if st.num_rows != len(d_rows):
        problems.append(f"rows spark={st.num_rows} duck={len(d_rows)}")
    if not problems:
        hs, hd = table_hash(s_names, s_rows), table_hash(d_names, d_rows)
        if hs != hd:
            problems.append("hash mismatch")
    if problems:
        print(f"  {name}: FAIL " + "; ".join(problems)); return 1
    print(f"  {name}: OK ({st.num_rows} rows)")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir"); ap.add_argument("out_dir")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--mem", default="48GB")
    ap.add_argument("--tmp", default="target/duck_tmp")
    ap.add_argument("--tmp-size", default="40GB")
    ap.add_argument("--only", default=""); ap.add_argument("--skip", default="")
    ap.add_argument("--json", dest="json_out", default="")
    ap.add_argument("--entry", default="")
    ap.add_argument("--staged", action="store_true",
                    help="materialize oracle CTEs as sequential temp tables")
    ap.add_argument("--dbfile", default="",
                    help="with --staged: file-backed db, stages as "
                         "persistent tables (flushed to disk per stage)")
    a = ap.parse_args()
    if a.entry:
        sys.exit(compare_one(a.sf_dir, a.out_dir, a.entry, a.mem, a.tmp,
                             a.tmp_size, a.staged, a.dbfile))
    only = set(filter(None, a.only.split(",")))
    skip = set(filter(None, a.skip.split(",")))
    names = sorted(os.path.basename(d.rstrip("/"))
                   for d in glob.glob(f"{a.out_dir}/*/"))
    names = [n for n in names if (not only or n in only) and n not in skip]
    report, failed = {}, []
    for n in names:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), a.sf_dir, a.out_dir,
                 "--entry", n, "--mem", a.mem, "--tmp", a.tmp,
                 "--tmp-size", a.tmp_size]
                + (["--staged"] if a.staged else [])
                + (["--dbfile", a.dbfile] if a.dbfile else []),
                timeout=a.timeout, capture_output=True, text=True)
            line = (r.stdout.strip().splitlines() or ["(no output)"])[-1]
            print(line, flush=True)
            status = ("oracle_error" if "ORACLE SQL ERROR" in line
                      else ("pass" if r.returncode == 0 else "fail"))
            report[n] = {"status": status, "sec": round(time.time() - t0, 1),
                         "detail": line.strip()}
            # a child that died before printing (import error, OOM kill)
            # leaves '(no output)' — keep a stderr tail for diagnosis
            if r.returncode != 0 and not r.stdout.strip() and r.stderr:
                report[n]["stderr_tail"] = r.stderr.strip()[-500:]
        except subprocess.TimeoutExpired:
            print(f"  {n}: TIMEOUT after {a.timeout}s", flush=True)
            report[n] = {"status": "timeout", "sec": a.timeout}
        # clean any spill the child left behind: the child spills ONLY
        # into the dedicated --tmp/spill subdirectory, so remove exactly
        # that — a shared --tmp location (/tmp, a dir also holding
        # --dbfile) keeps every unrelated entry it contains
        shutil.rmtree(os.path.join(a.tmp, "spill"), ignore_errors=True)
        if report[n]["status"] != "pass":
            failed.append(n)
    npass = sum(1 for v in report.values() if v["status"] == "pass")
    print(f"== {npass}/{len(names)} pass; non-pass: {failed} ==")
    if a.json_out:
        json.dump(report, open(a.json_out, "w"), indent=1)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
