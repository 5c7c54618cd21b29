#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's gate:
run Verify's parquet dumps against the DuckDB oracle SQL on the same
testdata tables; compare schema-agnostically (columns sorted by name, rows
sorted) and report per-query match.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    import os
    skipped = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            # not dumped (SPARK_GRAFT_VERIFY_ONLY subset run) — not a failure
            skipped += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            results[name] = f"NO_RESULT ({e})"
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g = got.reindex(sorted(got.columns), axis=1)
        e = exp.reindex(sorted(exp.columns), axis=1)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(g.columns)} oracle={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(g)} oracle={len(e)}"
            continue
        gs = g.apply(lambda r: tuple(norm_cell(x) for x in r), axis=1).sort_values().tolist() if len(g) else []
        es = e.apply(lambda r: tuple(norm_cell(x) for x in r), axis=1).sort_values().tolist() if len(e) else []
        if gs == es:
            results[name] = "OK"
        else:
            diffs = [(a, b) for a, b in zip(gs, es) if a != b][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" else "FAIL"
        print(f"{flag} {k}: {v if v != 'OK' else ''}")
    tail = f" ({skipped} not dumped, skipped)" if skipped else ""
    print(f"\n{ok}/{len(results)} oracle-checked queries match{tail}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
