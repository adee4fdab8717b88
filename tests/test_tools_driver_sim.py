"""Unit tests for tools/driver_sim.py's compare() — the in-repo
stand-in for the grading driver's order-insensitive value hash.  Every
"driver-sim green" claim in the round evidence rests on this function
actually detecting what the driver detects."""

import importlib.util
from pathlib import Path

import pandas as pd

TOOLS = Path(__file__).resolve().parents[1] / "tools" / "driver_sim.py"
spec = importlib.util.spec_from_file_location("driver_sim", TOOLS)
ds = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ds)


def test_compare_is_order_insensitive_in_rows_and_columns():
    a = pd.DataFrame({"k": [2, 1], "v": [20.5, 10.5]})
    b = pd.DataFrame({"v": [10.5, 20.5], "k": [1, 2]})
    assert ds.compare(a, b) == ""


def test_compare_detects_row_count_mismatch():
    a = pd.DataFrame({"k": [1, 2]})
    b = pd.DataFrame({"k": [1]})
    assert "rows" in ds.compare(a, b)


def test_compare_detects_column_set_mismatch():
    a = pd.DataFrame({"k": [1], "sum_qty": [2]})
    b = pd.DataFrame({"k": [1], "sum(l_quantity)": [2]})
    assert "cols" in ds.compare(a, b)


def test_compare_detects_single_cell_drift():
    a = pd.DataFrame({"k": [1, 2], "v": [1.000001, 2.0]})
    b = pd.DataFrame({"k": [1, 2], "v": [1.000002, 2.0]})
    msg = ds.compare(a, b)
    assert "values differ in 1 rows" in msg


def test_compare_string_compare_catches_dtype_rendering():
    # the driver hashes str() values: 14.06714 (float) vs
    # Decimal('14.067140') render differently -> must flag
    import decimal

    a = pd.DataFrame({"v": [decimal.Decimal("14.067140")]})
    b = pd.DataFrame({"v": [14.06714]})
    assert ds.compare(a, b) != ""


def test_compare_nulls_equal_only_to_nulls():
    a = pd.DataFrame({"v": [None, 1.0]})
    b = pd.DataFrame({"v": [1.0, None]})
    assert ds.compare(a, b) == ""
    c = pd.DataFrame({"v": [0.0, 1.0]})
    assert ds.compare(a, c) != ""
