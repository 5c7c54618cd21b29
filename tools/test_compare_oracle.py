#!/usr/bin/env python3
"""Unit cases for compare_oracle.py's cell canonicalization and CLI guard
(the VERDICT r15 'strict-mode hardening' checklist: NaN/NULL visibility,
tz-aware vs naive timestamps, pd.NA, argv arity). Run directly:

    python3 tools/test_compare_oracle.py
"""
import datetime
import decimal
import importlib.util
import math
import os
import subprocess
import sys

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "compare_oracle", os.path.join(HERE, "compare_oracle.py"))
co = importlib.util.module_from_spec(spec)
spec.loader.exec_module(co)

failures = []

def check(label, got, want):
    if got != want:
        failures.append(f"{label}: got {got!r}, want {want!r}")

# --- NULL family: None / pd.NA / pd.NaT all render as NULL in strict mode
check("None", co.norm_cell(None, True), "NULL")
check("pd.NA", co.norm_cell(pd.NA, True), "NULL")
check("pd.NaT", co.norm_cell(pd.NaT, True), "NULL")

# --- NaN: strict mode CONFLATES with NULL by design (driver parity —
# DuckDB fetchdf renders NULL doubles as NaN); lenient keeps them apart.
# The conflation is made visible via _nan_null_counts, tested below.
check("NaN strict", co.norm_cell(float("nan"), True), "NULL")
check("np NaN strict", co.norm_cell(np.float64("nan"), True), "NULL")
check("NaN lenient", co.norm_cell(float("nan"), False), "NaN")

# --- tz-aware and naive timestamps unify on UTC wall-clock
aware = pd.Timestamp("2024-03-01 12:00:00", tz="UTC")
offset = pd.Timestamp("2024-03-01 13:00:00", tz="Europe/Berlin")  # same instant (CET=UTC+1)
naive = pd.Timestamp("2024-03-01 12:00:00")
check("tz-aware", co.norm_cell(aware, True), co.norm_cell(naive, True))
check("tz-offset", co.norm_cell(offset, True), co.norm_cell(naive, True))
check("datetime", co.norm_cell(
    datetime.datetime(2024, 3, 1, 12), True), co.norm_cell(naive, True))

# --- DATE unifies with midnight TIMESTAMP (DuckDB fetchdf coerces DATE)
check("date", co.norm_cell(datetime.date(2024, 3, 1), True),
      co.norm_cell(pd.Timestamp("2024-03-01"), True))

# --- Decimal and float stay DISTINCT classes (the r13 q202-family trap)
check("decimal", co.norm_cell(decimal.Decimal("1.5"), True), "dec:1.5")
check("float", co.norm_cell(1.5, True), "float:1.5")
assert co.norm_cell(decimal.Decimal("1.5"), True) != co.norm_cell(1.5, True)

# --- int flavors unify; bool stays its own class (not int)
check("np.int64", co.norm_cell(np.int64(7), True), co.norm_cell(7, True))
check("bool", co.norm_cell(True, True), "bool:True")
assert co.norm_cell(True, True) != co.norm_cell(1, True)

# --- nested containers render recursively
check("array", co.norm_cell([1, None], True), "arr:[int:1,NULL]")
check("ndarray", co.norm_cell(np.array([1.0]), True), "arr:[float:1.0]")

# --- _nan_null_counts distinguishes what norm_cell conflates
df = pd.DataFrame({"a": [1.0, float("nan"), None]}, dtype=object)
check("nan_null_counts", co._nan_null_counts(df), (1, 1))

# --- argv arity: wrong arg count exits with usage, not a traceback
for argv in ([], ["only-one"], ["a", "b", "c"]):
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "compare_oracle.py")] + argv,
        capture_output=True, text=True)
    if p.returncode == 0:
        failures.append(f"argv {argv}: expected nonzero exit")
    if "Usage:" not in (p.stdout + p.stderr):
        failures.append(f"argv {argv}: usage text not shown")
# --strict alone is also an arity error (it is not a positional)
p = subprocess.run(
    [sys.executable, os.path.join(HERE, "compare_oracle.py"), "a", "--strict"],
    capture_output=True, text=True)
if p.returncode == 0:
    failures.append("argv ['a','--strict']: expected nonzero exit")

if failures:
    print("\n".join("FAIL " + f for f in failures))
    sys.exit(1)
print("compare_oracle unit cases: all pass")
