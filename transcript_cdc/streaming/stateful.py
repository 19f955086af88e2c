"""Custom stateful streaming operator via applyInPandasWithState.

Per-conversation running statistics maintained across micro-batches — the
kind of online aggregate (turns seen, latest lsn, deletes seen) a live
transcript pipeline exposes for monitoring without re-scanning the table.
State is a per-key tuple in the streaming state store (checkpointed with
the query, recovered on restart); each micro-batch's groups arrive as
Arrow-backed pandas frames (no per-row Python).

Reference analogue: the run-monitoring notification path
(ETL/lambda/glue_monitor.py:10-32) which reports per-run progress — here
upgraded to exact per-key online state with Structured Streaming fault
tolerance semantics.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CONV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("events_seen", T.LongType(), False),
        T.StructField("deletes_seen", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), False),
        T.StructField("distinct_turns_upper", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("events_seen", T.LongType()),
        T.StructField("deletes_seen", T.LongType()),
        T.StructField("max_lsn", T.LongType()),
        T.StructField("max_turn", T.LongType()),
    ]
)


def _update_conv_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    events = deletes = 0
    max_lsn = -1
    max_turn = -1
    for pdf in pdfs:  # Arrow batches for this key in this micro-batch
        events += len(pdf)
        deletes += int((pdf["op"] == "D").sum())
        max_lsn = max(max_lsn, int(pdf["lsn"].max()))
        max_turn = max(max_turn, int(pdf["turn_idx"].max()))
    if state.exists:
        p_events, p_deletes, p_lsn, p_turn = state.get
        events += p_events
        deletes += p_deletes
        max_lsn = max(max_lsn, p_lsn)
        max_turn = max(max_turn, p_turn)
    state.update((events, deletes, max_lsn, max_turn))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "events_seen": [events],
            "deletes_seen": [deletes],
            "max_lsn": [max_lsn],
            "distinct_turns_upper": [max_turn + 1],
        }
    )


def conversation_stats_stream(change_stream: DataFrame) -> DataFrame:
    """Running per-conversation stats over a streaming change feed.

    Emits one updated row per conversation per micro-batch that touched it
    (output mode Update). State persists in the query checkpoint."""
    return change_stream.groupBy("conv_id").applyInPandasWithState(
        _update_conv_stats,
        outputStructType=CONV_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
