#!/usr/bin/env python3
"""Restate q127_triangle_count's oracle for an ABOVE-WEDGE-BUDGET dump
(the r13 q146/q95 restatement pattern, applied to the r14 engine-side
scale dispatch): above `spark.graft.triangles.maxWedges` the engine's
q127 entry returns the DOULION-sampled census — n_parts/n_edges/
n_wedges exact, n_triangles = 8 * t_sampled — so the oracle must
replay the same content-hash coin and closure. This script splices
that restatement into a Verify dump's oracle_sql.json: it takes
q127b_triangle_sample's already-dumped SQL (which carries the exact
XXH64 coin CTE chain the engine uses), keeps its `e`/coin/`es`/`tri`
CTEs, and replaces the tail with the full-degree census aggregate and
q127's output projection.

The restatement is differentially proven before use at sf10: force the
flip at sf0.01/sf0.1 (SPARK_GRAFT_CONF="spark.graft.triangles.maxWedges=0"
graft.Verify) and hash-compare — the spliced oracle must match the
engine's sampled census exactly at scales where both paths are cheap.

Usage: restate_q127.py <verifyOutDir>   # rewrites oracle_sql.json in place
"""
import json, sys

MARKER = "), ne AS (SELECT COUNT(*) AS n FROM es)"

CENSUS_TAIL = """), deg AS (
  SELECT n, COUNT(*) AS dg
  FROM (SELECT u AS n FROM e UNION ALL SELECT v AS n FROM e)
  GROUP BY n
), agg AS (
  SELECT COUNT(*) AS n_parts, SUM(dg) // 2 AS n_edges,
         SUM(dg * (dg - 1)) // 2 AS wedges
  FROM deg
)
SELECT CAST(n_parts AS BIGINT) AS n_parts,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(wedges AS BIGINT) AS n_wedges,
       CAST(t * 8 AS BIGINT) AS n_triangles,
       CAST(ROUND((CAST(3 * (t * 8) AS DOUBLE) / CAST(wedges AS DOUBLE)) * 1e6, 0) AS BIGINT) / 1e6 AS clustering_coeff
FROM agg, tri"""


def main():
    out_dir = sys.argv[1]
    path = f"{out_dir}/oracle_sql.json"
    oracles = json.load(open(path))
    src = oracles["q127b_triangle_sample"]
    i = src.index(MARKER)  # raises if q127b's shape drifted — update both
    oracles["q127_triangle_count"] = src[:i] + CENSUS_TAIL
    json.dump(oracles, open(path, "w"))
    print(f"restated q127_triangle_count oracle in {path} "
          f"(sampled-census replay, {len(oracles['q127_triangle_count'])} chars)")


if __name__ == "__main__":
    main()
