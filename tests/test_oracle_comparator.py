"""Unit tests for the oracle comparator itself — the load-bearing
infrastructure every correctness claim in this repo flows through.
A comparator that silently passes mismatches would invalidate the
whole gate, so its detection behavior gets pinned directly (pure
pandas, no Spark)."""

from __future__ import annotations

import math

import pandas as pd

from motorway_spark.oracle import compare_frames


def _df(**cols):
    return pd.DataFrame(dict(cols))


def test_identical_frames_pass_any_row_order():
    a = _df(k=[1, 2, 3], v=[1.5, 2.5, 3.5])
    b = _df(v=[3.5, 1.5, 2.5], k=[3, 1, 2])  # shuffled rows AND columns
    assert compare_frames(a, b) == []


def test_row_count_mismatch_detected():
    assert any(
        "row count" in p
        for p in compare_frames(_df(k=[1, 2]), _df(k=[1]))
    )


def test_column_set_mismatch_detected():
    out = compare_frames(_df(k=[1]), _df(j=[1]))
    assert any("columns" in p for p in out)


def test_value_mismatch_detected():
    out = compare_frames(_df(k=[1, 2], v=[1.0, 2.0]), _df(k=[1, 2], v=[1.0, 2.0001]))
    assert any("value[" in p for p in out)


def test_dtype_kind_mismatch_detected_without_value_diff():
    """25 vs 25.0 passes a value compare but must FAIL the gate — the
    driver's hash is dtype-sensitive (the fn_math/pivot lesson)."""
    out = compare_frames(_df(v=[25, 26]), _df(v=[25.0, 26.0]))
    assert any("dtype" in p for p in out)


def test_nullable_int_promotion_is_tolerated():
    """Engines promote nullable ints to float differently; with nulls
    present the dtype check stands down and values decide."""
    a = _df(v=pd.array([1, None], dtype="float64"))
    b = _df(v=pd.array([1, None], dtype="float64"))
    assert compare_frames(a, b) == []


def test_nan_equals_nan_and_lists_compare_elementwise():
    a = _df(v=[float("nan"), 1.0], w=[[1, 2], [3]])
    b = _df(v=[float("nan"), 1.0], w=[[1, 2], [3]])
    assert compare_frames(a, b) == []
    c = _df(v=[float("nan"), 1.0], w=[[1, 2], [4]])
    assert any("value[" in p for p in compare_frames(a, c))


def test_mismatch_summary_caps_at_three_examples():
    a = _df(v=list(range(10)))
    b = _df(v=[x + 100 for x in range(10)])
    out = compare_frames(a, b)
    assert sum("value[" in p for p in out) == 3
    assert any("10 mismatched cells" in p for p in out)


def test_float_compare_is_exact_not_tolerant():
    """The gate is deliberately exact: a 1-ulp drift is a real
    determinism bug under this repo's conventions."""
    x = 0.1 + 0.2  # 0.30000000000000004
    out = compare_frames(_df(v=[x]), _df(v=[0.3]))
    assert any("value[" in p for p in out)
    assert math.isclose(x, 0.3)  # close is not good enough


def test_json_record_rows_only_zero_rows_is_a_fail():
    """ADVICE r4: a rows-only query that fails the rows>0 gate must be
    status=="fail" so status filters count it; the check KIND lives in
    its own field."""
    from motorway_spark.oracle import json_record

    record = json_record(
        {
            "ok_oracle": [],
            "ok_rows_only": ["(rows-only check)"],
            "empty_rows_only": ["no rows", "(rows-only check)"],
            "bad_oracle": ["row count: spark=1 oracle=2"],
        }
    )
    assert record["ok_oracle"] == {"status": "pass", "check": "oracle", "problems": []}
    assert record["ok_rows_only"]["status"] == "pass"
    assert record["ok_rows_only"]["check"] == "rows_only"
    assert record["empty_rows_only"]["status"] == "fail"
    assert record["empty_rows_only"]["check"] == "rows_only"
    assert record["empty_rows_only"]["problems"] == ["no rows"]
    assert record["bad_oracle"]["status"] == "fail"


def test_json_flag_without_operand_exits_cleanly(monkeypatch):
    """ADVICE r4: `--json` as the last argv must not raise IndexError."""
    import sys as _sys

    from motorway_spark import oracle

    monkeypatch.setattr(_sys, "argv", ["oracle", "--json"])
    assert oracle.main() == 2
