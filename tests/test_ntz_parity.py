"""Parity under DRIVER-DEFAULT session confs (round-1 verdict item 2).

The round-1 sessionize bug (CAST(TIMESTAMP_NTZ AS DOUBLE) is illegal in
Spark 4) was invisible locally because session.py pins
``spark.sql.parquet.inferTimestampNTZ.enabled=false`` while the driver's
default session reads the fixture parquet as TIMESTAMP_NTZ. This module
re-runs every timestamp-touching oracled query with NTZ inference ON —
the same timestamp type the driver sees — so that class of type-coercion
bug can never hide behind the session config again.
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

# Every oracled query whose plan touches a timestamp column.
TS_QUERIES = [
    "sessionize_events",
    "filter_range_in_events",
    "daily_counts_events",
    "window_hourly_events",
    "commit_metrics_lineitem",
    "date_arith_orders",
]

NTZ_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"


@pytest.fixture()
def ntz_spark(spark):
    old = spark.conf.get(NTZ_CONF)
    spark.conf.set(NTZ_CONF, "true")
    yield spark
    spark.conf.set(NTZ_CONF, old)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ["events", "lineitem", "orders"]:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif str(df[c].dtype) in ("Int32", "Int64", "int32"):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def test_events_read_as_ntz(ntz_spark):
    """Precondition: with driver-default inference the feed really IS NTZ —
    otherwise this module wouldn't be testing anything."""
    ev = ntz_spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    assert ev.schema["ts"].dataType.simpleString() == "timestamp_ntz"


@pytest.mark.parametrize("name", TS_QUERIES)
def test_query_matches_oracle_under_ntz(ntz_spark, ddb, name):
    spark_pdf = entrymod.queries()[name](ntz_spark, SF_DIR).toPandas()
    duck_pdf = ddb.execute(entrymod.oracle_sql()[name]).fetchdf()
    assert len(spark_pdf) == len(duck_pdf), f"{name}: row count mismatch"
    a, b = _canon(spark_pdf), _canon(duck_pdf)
    pd.testing.assert_frame_equal(
        a, b, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9
    )
