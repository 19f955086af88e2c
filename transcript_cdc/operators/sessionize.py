"""Gap-based sessionization (engine addition; streaming-shaped op).

Splits each key's event sequence into sessions at inactivity gaps — the
batch twin of Structured Streaming's session windows
(``F.session_window``). Implemented as lag + running-sum over one window
per key: exactly one shuffle on the key, no UDFs.

At scale: the window shuffles on (key) alone, so a hot key serializes its
own timeline (inherent to sessionization — ordering within the key is the
semantics); AQE skew handling and the fact that per-key timelines are
bounded in practice keep this safe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_seconds(c: Column | str) -> Column:
    """Epoch seconds (double, µs-exact) for TIMESTAMP **and** TIMESTAMP_NTZ.

    Spark 4 forbids ``CAST(TIMESTAMP_NTZ AS DOUBLE)`` (the round-1 driver
    failure: the driver session reads feed parquet as NTZ). Routing through
    ``timestamp_ltz`` is legal from both timestamp types; the NTZ→LTZ
    interpretation uses the session timezone, which cancels out everywhere
    this helper is used (gaps and durations are differences)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c.cast("timestamp_ltz")) / F.lit(1e6)


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    session_col: str = "session_idx",
) -> DataFrame:
    """Tag each row with a 0-based session index per key."""
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    gap_s = gap_minutes * 60.0
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev.isNull()
        | (epoch_seconds(ts_col) - epoch_seconds(prev) > F.lit(gap_s))
    ).cast("long")
    return df.withColumn(
        session_col,
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_summary(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """One row per (key, session): event count, start, end, duration."""
    key_cols = list(key_cols)
    tagged = sessionize(df, key_cols, ts_col, gap_minutes)
    return tagged.groupBy(*key_cols, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(epoch_seconds(ts_col)) - F.min(epoch_seconds(ts_col)))
        .alias("duration_s"),
    )
