"""Unit tests for the local oracle harness's value hashing.

Round-5 ask: the ``doc_repetition`` bug class (outer join / DuckDB HUGEINT
sum turning an int column into float64 in ``fetchdf``) must be reported as
a representation difference, not a value difference — ``value_hash`` now
normalizes integral-valued floats so the local harness compares values,
while the oracle SQL keeps explicit ``::bigint`` casts for the driver's
stricter hash.
"""

import importlib.util
import pathlib

import numpy as np
import pandas as pd

_SPEC = importlib.util.spec_from_file_location(
    "check_oracles",
    pathlib.Path(__file__).resolve().parents[1] / "tools" / "check_oracles.py",
)
check_oracles = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(check_oracles)
value_hash = check_oracles.value_hash


def test_int_vs_integral_float64_hash_equal():
    a = pd.DataFrame({"id": [1, 2, 3], "n_lines": np.array([1, 7, 42], dtype="int64")})
    b = pd.DataFrame({"id": [1, 2, 3], "n_lines": np.array([1.0, 7.0, 42.0])})
    assert b["n_lines"].dtype == np.float64
    assert value_hash(a) == value_hash(b)


def test_genuinely_different_values_still_mismatch():
    a = pd.DataFrame({"id": [1], "v": [2]})
    b = pd.DataFrame({"id": [1], "v": [2.5]})
    assert value_hash(a) != value_hash(b)


def test_fractional_floats_unchanged():
    # Fractional floats keep their repr; identical frames hash identically.
    a = pd.DataFrame({"x": [0.123456, 1.5]})
    b = pd.DataFrame({"x": [0.123456, 1.5]})
    assert value_hash(a) == value_hash(b)


def test_nan_and_large_magnitude_pass_through():
    # NaN and |v| >= 2^53 are rendered verbatim (no int collapse).
    a = pd.DataFrame({"x": [float("nan"), 2.0**53]})
    b = pd.DataFrame({"x": [float("nan"), 2.0**53]})
    assert value_hash(a) == value_hash(b)
    c = pd.DataFrame({"x": [float("nan"), 2.0**53 + 2]})
    assert value_hash(a) != value_hash(c)


def test_column_order_invariant():
    a = pd.DataFrame({"b": [1], "a": ["x"]})
    b = pd.DataFrame({"a": ["x"], "b": [1]})
    assert value_hash(a) == value_hash(b)
