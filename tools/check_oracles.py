#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query, read the
Spark parquet dump (written by graft.Verify) and the DuckDB oracle result,
sort columns by name, and compare schema + row values exactly.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir> [--json OUT] [query...]

--json OUT additionally writes a provenance-stamped artifact: git HEAD of
the repo, registry count, per-query ok/fail — so artifact-vs-tree drift is
a one-line diff (VERDICT r9 item 4).
"""
import json, math, subprocess, sys
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    json_out = None
    if "--json" in rest:
        i = rest.index("--json")
        json_out = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]
    only = set(rest)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = 0
    results = {}
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        try:
            spark_tbl = pq.read_table(f"{outdir}/{name}")
            duck_tbl = con.sql(sql).arrow()
            s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck_tbl.column_names)
            if s_cols != d_cols:
                raise AssertionError(f"columns differ: spark={s_cols} duck={d_cols}")
            s = spark_tbl.select(s_cols)
            d = duck_tbl.select(s_cols)
            if s.num_rows != d.num_rows:
                raise AssertionError(f"row count: spark={s.num_rows} duck={d.num_rows}")
            s_types = [str(t) for t in s.schema.types]
            d_types = [str(t) for t in d.schema.types]
            # Type drift is a FAIL, not a warn: the driver hashes value
            # REPRESENTATIONS, so a type mismatch that python-value-compares
            # equal can still be driver-red (this asymmetry hid two red rows
            # for two rounds — VERDICT r10 "What's wrong" 2).
            if s_types != d_types:
                raise AssertionError(
                    f"type drift: spark={s_types} duck={d_types}")
            # No DECIMAL column may appear in a t2 output schema (CLAUDE.md
            # invariant): decimal hash canonicalization is the one class the
            # two engines' driver read paths disagree on. Emit canonical
            # digit strings for >64-bit integers instead.
            dec = [f"{c}:{t}" for c, t in zip(s_cols, s_types)
                   if t.startswith("decimal")]
            if dec:
                raise AssertionError(f"DECIMAL in output schema: {dec}")
            sp, dp = s.to_pylist(), d.to_pylist()
            for i, (r1, r2) in enumerate(zip(sp, dp)):
                for c in s_cols:
                    v1, v2 = norm(r1[c]), norm(r2[c])
                    if v1 != v2:
                        raise AssertionError(
                            f"row {i} col {c}: spark={v1!r} duck={v2!r}\n"
                            f"  spark row: {r1}\n  duck row:  {r2}")
            print(f"  OK   {name} ({s.num_rows} rows)")
            results[name] = {"ok": True, "rows": s.num_rows}
            n_ok += 1
        except Exception as e:
            print(f"  FAIL {name}: {str(e)[:500]}")
            results[name] = {"ok": False, "err": str(e)[:300]}
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    if json_out:
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        head = subprocess.run(["git", "-C", repo, "rev-parse", "HEAD"],
                              capture_output=True, text=True).stdout.strip()
        with open(json_out, "w") as f:
            dumped = len([d for d in os.listdir(outdir)
                          if os.path.isdir(os.path.join(outdir, d))])
            json.dump({"head": head, "sf_dir": sfdir,
                       "registry_count": dumped,
                       "oracled_count": len(oracles),
                       "checked": n_ok + n_fail,
                       "ok": n_ok, "fail": n_fail,
                       "results": results}, f, indent=1, sort_keys=True)
        print(f"[json] {json_out} (head {head[:9]})")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
