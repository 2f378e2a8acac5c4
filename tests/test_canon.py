"""Lock the driver-faithful canon (tools/check_oracles.canon_frame):
dtype representation is part of the value, exactly like the grading
driver's pandas string comparison.  These fixtures encode the three
failure classes CORRECTNESS_r07 recorded, so a future 'simplification'
of the canon that forgives them fails here first."""

from __future__ import annotations

import sys
from decimal import Decimal
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracles import canon_frame, frame_hash  # noqa: E402


def _h(df):
    return frame_hash(canon_frame(df))


def test_equal_values_equal_dtypes_match():
    a = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    b = pd.DataFrame({"v": [2.5, 1.5], "k": [2, 1]})  # column + row order free
    assert _h(a) == _h(b)


def test_int_vs_float64_mismatch():
    """DuckDB SUM(int)->HUGEINT->float64 '2085.0' vs Spark int64 '2085'
    — the 9-query r7 class. The canon must NOT forgive it."""
    a = pd.DataFrame({"n": pd.array([2085], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([2085.0], dtype="float64")})
    assert _h(a) != _h(b)


def test_decimal_trailing_zeros_mismatch():
    """Spark DECIMAL(p,2) toPandas -> Decimal('89158.00') vs oracle
    DOUBLE '89158.0' — the r7 DECIMAL-output class."""
    a = pd.DataFrame({"p": [Decimal("89158.00")]})
    b = pd.DataFrame({"p": [89158.0]})
    assert _h(a) != _h(b)


def test_list_cells_raise():
    """Array-valued outputs kill the driver's sort (unhashable list);
    the canon must raise, not silently stringify."""
    df = pd.DataFrame({"doc": [1, 2], "hist": [[1, 2], [3, 4]]})
    with pytest.raises(TypeError):
        canon_frame(df)


def test_nullable_int_mismatch():
    """A nullable int64 column crosses .df() as float64 ('3.0' vs '3')."""
    a = pd.DataFrame({"x": pd.array([3, None], dtype="float64")})
    b = pd.DataFrame({"x": pd.array([3, None], dtype="object")})
    assert _h(a) != _h(b)
