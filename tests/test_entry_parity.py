"""Replicates the driver's correctness gate locally: every __spark_entry__
query vs its DuckDB oracle at sf0.01 — row count, schema width, and
order-insensitive value equality (columns sorted by name).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _cell(v) -> str:
    """Stringify one cell the way an exact value hash would: int64 0 and
    float64 0.0 must NOT collide (that distinction is exactly what the
    driver's hash catches and what round 2's lenient rtol compare masked).
    """
    import datetime as _dt
    import math

    import numpy as np

    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        # Driver-observed behavior (CORRECTNESS_r02: date_arith_orders,
        # daily_counts_events green): a Spark DATE (datetime.date via
        # toPandas) and DuckDB's midnight datetime64 (fetchdf renders DATE
        # as timestamp) hash equal — unify midnight timestamps with dates.
        ns = getattr(v, "nanosecond", 0)
        if (v.hour, v.minute, v.second, v.microsecond, ns) == (0, 0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-faithful canonical form: columns sorted by name, every cell
    exactly stringified (no dtype unification, no rounding, no rtol), rows
    sorted by the stringified tuple. A dtype-representation divergence the
    driver's exact hash would catch fails here too.
    """
    df = df[sorted(df.columns)]
    out = pd.DataFrame({c: [_cell(v) for v in df[c]] for c in df.columns})
    return out.sort_values(list(out.columns), kind="stable").reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql().keys())
ALL = sorted(entrymod.queries().keys())


def test_every_oracle_has_query():
    assert set(ORACLED) <= set(ALL)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    try:
        pd.testing.assert_frame_equal(a, b, check_exact=True)
    except AssertionError as e:
        raise AssertionError(f"{name}: value mismatch\n{e}\nspark:\n{a.head()}\noracle:\n{b.head()}") from e


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLED])
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0 and len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
