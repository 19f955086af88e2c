"""As-of join semantics (operators/asof.py): inclusive/strict boundaries,
tolerance windows, unmatched and null-ts left rows, and plan shape (one
exchange — the union+window composition must not range-explode)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from transcript_cdc.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tables(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01T10:00:00")),   # exactly on a right row
            (2, "a", _ts("2024-01-01T11:00:00")),   # between right rows
            (3, "a", _ts("2024-01-01T09:00:00")),   # before every right row
            (4, "b", _ts("2024-01-01T12:00:00")),   # other key
            (5, "c", _ts("2024-01-01T12:00:00")),   # key with no right rows
            (6, "a", None),                          # null ts never matches
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01T10:00:00"), 100.0),
            ("a", _ts("2024-01-01T10:30:00"), 200.0),
            ("b", _ts("2024-01-01T09:30:00"), 300.0),
        ],
        "k string, ts timestamp, v double",
    )
    return left, right


def _by_id(df):
    return {r["id"]: r.asDict() for r in df.collect()}


def test_backward_inclusive(spark, tables):
    left, right = tables
    out = _by_id(asof_join(left, right, on=["k"], prefix="m_"))
    assert out[1]["m_v"] == 100.0          # equal ts matches (inclusive)
    assert out[2]["m_v"] == 200.0          # newest at-or-before wins
    assert out[3]["m_v"] is None           # nothing precedes
    assert out[4]["m_v"] == 300.0
    assert out[5]["m_v"] is None           # key absent from right
    assert out[6]["m_v"] is None           # null ts
    assert out[2]["m_ts"] == _ts("2024-01-01T10:30:00")
    # left rows all survive (LEFT join semantics)
    assert len(out) == 6


def test_strict_excludes_equal_ts(spark, tables):
    left, right = tables
    out = _by_id(asof_join(left, right, on=["k"], prefix="m_", strict=True))
    assert out[1]["m_v"] is None           # equal ts no longer matches
    assert out[2]["m_v"] == 200.0          # earlier rows still do


def test_tolerance_nulls_stale_matches(spark, tables):
    left, right = tables
    out = _by_id(
        asof_join(left, right, on=["k"], prefix="m_", tolerance_seconds=1800)
    )
    assert out[2]["m_v"] == 200.0          # 30min gap: inside tolerance
    assert out[4]["m_v"] is None           # 2.5h gap: outside


def test_right_value_col_selection(spark, tables):
    left, right = tables
    out = asof_join(
        left, right, on=["k"], right_value_cols=["v"], prefix="x_"
    )
    assert set(out.columns) == {"id", "k", "ts", "x_ts", "x_v"}


def test_single_exchange_plan(spark, tables):
    """The whole as-of is ONE hash shuffle on the key: no range join, no
    cartesian blow-up. (AQE splits the one exchange on skew.)"""
    left, right = tables
    plan = (
        asof_join(left, right, on=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
