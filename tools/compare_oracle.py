#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver's gate:
run Verify's parquet dumps against the DuckDB oracle SQL on the same
testdata tables; compare schema-agnostically (columns sorted by name, rows
sorted) and report per-query match.

Usage: compare_oracle.py <sfDir> <verifyOutDir> [--strict]

--strict replicates the driver's canonicalization asymmetry: the Spark
dump is read with pyarrow/pandas (decimal128 stays decimal.Decimal,
date32 stays date), while the oracle goes through DuckDB's fetchdf
(DECIMAL coerces to float64, DATE to datetime64) — and every cell is
rendered TYPE-TAGGED. A gate whose dump carries a physical DECIMAL/DATE
column that the oracle renders differently fails here before the driver
round-trip (this is exactly how q202/q203/q205/q207 failed in r13).
Default (lenient) mode reads both sides through DuckDB, which hides
those divergences but is robust for quick value checks.
"""
import json, sys, math, os, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v, strict):
    if strict:
        # Type-tagged rendering mirroring the driver's canonicalization:
        # temporal and integer flavors (pyarrow date vs pandas Timestamp,
        # numpy.int64 vs int) unify — the driver provably treats those
        # consistently (q12/q206 pass) — but Decimal and float stay
        # DISTINCT classes, which is the divergence that failed
        # q202/q203/q205/q207 in r13.
        import datetime, decimal
        import numpy as np
        import pandas as pd
        if v is None or v is pd.NaT or v is pd.NA:
            return "NULL"
        # NaN unifies with NULL — not by choice but to mirror the
        # driver: DuckDB's fetchdf coerces NULL in double columns to
        # NaN (nullable-float64 artifact), and gates whose oracle side
        # carries such NULLs (q38/q143/q146/q156) pass the driver's
        # hash, so the driver provably conflates them. Tagging NaN
        # distinctly here produced 5 false FAILs against green gates.
        if isinstance(v, (float, np.floating)) and math.isnan(v):
            return "NULL"
        if isinstance(v, decimal.Decimal):
            return f"dec:{v}"
        if isinstance(v, (bool, np.bool_)):
            return f"bool:{bool(v)}"
        if isinstance(v, (int, np.integer)):
            return f"int:{int(v)}"
        if isinstance(v, (float, np.floating)):
            return f"float:{float(v)!r}"
        if isinstance(v, pd.Timestamp):
            # unify tz-aware (pyarrow UTC-instant) with naive (DuckDB
            # fetchdf) renderings: both become naive UTC wall-clock
            if v.tzinfo is not None:
                v = v.tz_convert("UTC").tz_localize(None)
            return f"ts:{v.isoformat()}"
        if isinstance(v, datetime.datetime):
            return f"ts:{pd.Timestamp(v).isoformat()}"
        if isinstance(v, datetime.date):
            # DATE unifies with midnight TIMESTAMP: DuckDB's fetchdf
            # coerces DATE to datetime64 while pyarrow keeps date32 as
            # datetime.date, and the driver provably treats those as
            # equal (q206 passed r13 with a date column)
            return f"ts:{pd.Timestamp(v).isoformat()}"
        if isinstance(v, (bytes, bytearray)):
            return f"bytes:{bytes(v)!r}"
        if isinstance(v, str):
            return f"str:{v!r}"
        if isinstance(v, (list, tuple, np.ndarray, dict)):
            if isinstance(v, dict):
                return "map:{" + ",".join(
                    f"{norm_cell(k, True)}={norm_cell(x, True)}"
                    for k, x in sorted(v.items(), key=lambda p: repr(p[0]))) + "}"
            return "arr:[" + ",".join(norm_cell(x, True) for x in v) + "]"
        return f"{type(v).__name__}:{v!r}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return repr(v)

def _nan_null_counts(df):
    """(float-NaN cells, true-NULL cells) — distinguishes what norm_cell
    deliberately conflates, so strict mode can WARN when a match depended
    on the conflation. Dumps at sf0.01 are small; the python loop is fine."""
    import numpy as np
    import pandas as pd
    nan = null = 0
    for c in df.columns:
        for v in df[c]:
            if v is None or v is pd.NaT or v is pd.NA:
                null += 1
            elif isinstance(v, (float, np.floating)) and math.isnan(v):
                nan += 1
    return nan, null

def main(sf_dir, out_dir, strict=False):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    warnings = {}
    skipped = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            # not dumped (SPARK_GRAFT_VERIFY_ONLY subset run) — not a failure
            skipped += 1
            continue
        try:
            if strict:
                import pandas as pd
                parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
                got = pd.concat([pd.read_parquet(p, engine="pyarrow")
                                 for p in parts], ignore_index=True) if parts \
                    else pd.DataFrame()
                # flag physical types whose canonicalization is known to
                # diverge between pyarrow and duckdb-pandas renderings
                import pyarrow.parquet as pq
                sch = pq.read_schema(parts[0]) if parts else None
                risky = [] if sch is None else [
                    f.name for f in sch
                    if str(f.type).startswith("decimal")]
                if risky:
                    warnings[name] = f"physical {risky} in dump — driver hash risk"
            else:
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
        gs = g.apply(lambda r: tuple(norm_cell(x, strict) for x in r), axis=1).sort_values().tolist() if len(g) else []
        es = e.apply(lambda r: tuple(norm_cell(x, strict) for x in r), axis=1).sort_values().tolist() if len(e) else []
        if gs == es:
            results[name] = "OK"
            if strict:
                # NaN↔NULL conflation is deliberate (driver parity — see
                # norm_cell) but should never be INVISIBLE: when the two
                # sides carry different NaN/NULL populations yet still
                # match, the pass depended on the conflation — surface it.
                gk, ek = _nan_null_counts(g), _nan_null_counts(e)
                if gk != ek:
                    warnings[name] = (
                        f"match relies on NaN/NULL conflation "
                        f"(spark nan,null={gk} oracle nan,null={ek})"
                        + (f"; {warnings[name]}" if name in warnings else ""))
        else:
            diffs = [(a, b) for a, b in zip(gs, es) if a != b][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
    ok = sum(1 for v in results.values() if v == "OK")
    for k, v in sorted(results.items()):
        flag = "PASS" if v == "OK" else "FAIL"
        warn = f"  [WARN {warnings[k]}]" if k in warnings else ""
        print(f"{flag} {k}: {v if v != 'OK' else ''}{warn}")
    tail = f" ({skipped} not dumped, skipped)" if skipped else ""
    mode = "strict" if strict else "lenient"
    print(f"\n{ok}/{len(results)} oracle-checked queries match [{mode}]{tail}")

if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    if len(argv) != 2:
        sys.exit(__doc__.strip())
    main(argv[0], argv[1], strict="--strict" in sys.argv)
