"""tools/check_oracle.py must be dtype-KIND strict.

Round 7's one red driver row (dedup_simhash_md5) was invisible locally:
DuckDB widened SUM(1::BIGINT << bit) to HUGEINT, pandas landed it as
float64, and the old numeric comparison passed int64 vs float64 when
values matched — while the driver's value-hash (rendered cells) did
not. An int column vs a float column must now FAIL locally."""

from __future__ import annotations

import importlib.util
import os
import sys

import pandas as pd

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tools", "check_oracle.py")
_spec = importlib.util.spec_from_file_location("check_oracle", _TOOLS)
check_oracle = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("check_oracle", check_oracle)
_spec.loader.exec_module(check_oracle)


def test_int_vs_float_kind_mismatch_fails():
    a = pd.DataFrame({"simhash": pd.Series([1593155260, 7], dtype="int64")})
    b = pd.DataFrame({"simhash": pd.Series([1593155260.0, 7.0],
                                           dtype="float64")})
    problems = check_oracle.compare("t", a, b)
    assert problems and "dtype kind" in problems[0]


def test_matching_int_kinds_pass():
    a = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"x": pd.Series([1, 2], dtype="int32")})
    assert check_oracle.compare("t", a, b) == []


def test_matching_floats_pass():
    a = pd.DataFrame({"x": pd.Series([1.5, 2.5])})
    b = pd.DataFrame({"x": pd.Series([1.5, 2.5])})
    assert check_oracle.compare("t", a, b) == []


def test_float_value_mismatch_still_fails():
    a = pd.DataFrame({"x": pd.Series([1.5, 2.5])})
    b = pd.DataFrame({"x": pd.Series([1.5, 2.6])})
    assert check_oracle.compare("t", a, b)


def test_null_widened_float_vs_int_compares_values():
    # pandas NULL-widening artifact: float-with-NaN vs int stays a value
    # comparison (nullness mismatch is caught by the values, not kinds)
    a = pd.DataFrame({"x": pd.Series([1.0, float("nan")])})
    b = pd.DataFrame({"x": pd.Series([1, 2], dtype="int64")})
    assert check_oracle.compare("t", a, b)  # differs — NaN vs 2
