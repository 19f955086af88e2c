"""As-of (point-in-time) join — the temporal lookup CDC/feature pipelines need.

The reference joins each query against the *latest* state of a document
(OpenSearch OVERWRITE store always serves the last write —
ETL/batch_ecs/source/pipeline.py:51-54); an as-of join is the general form:
for every left row, the newest right row at-or-before its timestamp within
the same key. Classic uses over transcript tables: join each turn to the
most recent model/config change, each event to the prevailing session
state, label rows against feature snapshots without leakage.

Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
``l JOIN r ON l.k = r.k AND r.ts <= l.ts`` + window explodes to
O(|matches|) intermediate rows. This is the scalable composition:

  union(left, right) tagged by side
    → window over key ORDER BY (ts, side) with
      last(right_payload, ignorenulls=True) ROWS UNBOUNDED PRECEDING..CURRENT
    → keep left rows, unpack the carried payload

ONE hash shuffle on the join key (same as any equi-join) and a partition-
local sort — no range explosion, no per-row Python, and AQE's skew-join
split applies to the single exchange. At 10^10 rows this is the plan a
range join cannot match: cost is O((|L|+|R|) log) per key partition,
independent of how many right rows precede each left row.

Determinism: callers must make ``right`` unique per (key, right_ts) —
e.g. ``lww_dedup(right, [*on, right_ts], order_col)`` — otherwise which
equal-timestamp row wins depends on partition order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_L, _R = 1, 0  # scan-order tags: right rows sort before left at equal ts


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
    strict: bool = False,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: newest right row with right_ts <= left_ts per key.

    ``strict=True`` uses ``<`` (a right row exactly at left_ts no longer
    matches — the leakage-safe variant for feature joins). ``tolerance_
    seconds`` nulls out matches older than the window. Unmatched left rows
    survive with null match columns (LEFT join semantics). Left rows with
    null ``left_ts`` never match.

    Output: every left column, then ``{prefix}{right_ts}`` and
    ``{prefix}{c}`` for each right value column.
    """
    on = list(on)
    rv = right_value_cols
    if rv is None:
        rv = [c for c in right.columns if c not in (*on, right_ts)]

    payload = F.struct(
        F.col(right_ts).alias("__mts"), *[F.col(c).alias(c) for c in rv]
    )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        # strict: a right row at ts must lose to a left row at the same ts,
        # so it enters the scan order *after* the left side.
        F.lit(_L if strict else _R).alias("__side"),
        payload.alias("__r"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(_R if strict else _L).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # asc puts nulls first in Spark: null-ts left rows scan before every
    # right row and therefore carry no match, as documented.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lhs_side = _R if strict else _L
    m = (
        u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == F.lit(lhs_side))
    )
    if tolerance_seconds is not None:
        # timestamp_ltz casts are NTZ-safe (sessionize.py round-1 lesson)
        in_tol = (
            F.unix_micros(F.col("__ts").cast("timestamp_ltz")) / 1e6
            - F.unix_micros(F.col("__m.__mts").cast("timestamp_ltz")) / 1e6
        ) <= F.lit(float(tolerance_seconds))
        m = m.withColumn("__m", F.when(in_tol, F.col("__m")))

    out = [F.col(c) for c in left.columns]
    out.append(F.col("__m.__mts").alias(f"{prefix}{right_ts}"))
    out.extend(F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in rv)
    return m.select(*out)
