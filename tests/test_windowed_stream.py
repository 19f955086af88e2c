"""Watermarked windowed aggregation over the streaming WAL tail (T-family).

Deterministic two-batch drive of streaming/windows.windowed_op_counts:

- batch 1 establishes event-time up to T+10min → checkpointed watermark
  becomes T+8min (delay 2min);
- batch 2 delivers one event INSIDE the watermark (T+9min — must update
  its window) and one event OLDER than the watermark (T+1min — must be
  dropped before the aggregate, per Spark's late-data contract).

foreachBatch captures each micro-batch's UPDATE-mode output so the
assertion can see exactly which windows changed in batch 2. The same
operator applied to the full feed as a BATCH DataFrame is the oracle for
the on-time windows (withWatermark is a no-op in batch).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from transcript_cdc import schemas
from transcript_cdc.streaming.windows import windowed_op_counts

BASE = pd.Timestamp("2025-03-01 00:00:00")
COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _write(path: str, name: str, rows: list) -> None:
    df = pd.DataFrame(rows, columns=COLS).astype(
        {"turn_idx": "int32", "tool": "string"}
    )
    df.to_parquet(os.path.join(path, name), index=False, coerce_timestamps="us")


def _row(lsn, op, conv, minute, second=0):
    return (
        lsn, op, conv, 0, "user", f"t {lsn}", None,
        BASE + pd.Timedelta(minutes=minute, seconds=second),
    )


@pytest.fixture()
def feed(tmp_path):
    d = str(tmp_path / "feed")
    os.makedirs(d)
    # batch 1: minutes 0..10 — two events in minute 1, one per minute after
    rows = [_row(0, "I", "conv-a", 1), _row(1, "U", "conv-b", 1, 30)]
    rows += [_row(2 + m, "I", f"conv-{m}", m) for m in range(2, 11)]
    _write(d, "part-000.parquet", rows)
    return d


def _drive(spark, feed_dir, ckpt, captured):
    stream = (
        spark.readStream.schema(schemas.CHANGE_SCHEMA_EVOLVED)
        .option("maxFilesPerTrigger", 100)
        .parquet(feed_dir)
    )
    agg = windowed_op_counts(stream, window="1 minute", watermark="2 minutes")

    def sink(df, epoch_id):
        captured.append((int(epoch_id), df.toPandas()))

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_watermark_drops_late_updates_on_time(spark, feed, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    captured: list = []
    _drive(spark, feed, ckpt, captured)
    batch1 = pd.concat([p for _, p in captured], ignore_index=True)
    # minute-1 window saw two events in batch 1
    m1 = batch1[batch1["window_start"] == BASE + pd.Timedelta(minutes=1)]
    assert set(m1["op"]) == {"I", "U"} and int(m1["n_events"].sum()) == 2

    # batch 2: one on-time event (minute 9 ≥ watermark 10-2=8) and one
    # too-late event (minute 1 < 8) — the late one must vanish
    _write(
        feed,
        "part-001.parquet",
        [_row(100, "I", "conv-late-ok", 9, 15), _row(101, "I", "conv-too-late", 1, 45)],
    )
    captured2: list = []
    _drive(spark, feed, ckpt, captured2)
    upd = pd.concat(
        [p for _, p in captured2], ignore_index=True
    ) if captured2 else pd.DataFrame(columns=batch1.columns)
    upd_windows = set(upd["window_start"]) if len(upd) else set()
    assert BASE + pd.Timedelta(minutes=9) in upd_windows, "on-time update lost"
    assert BASE + pd.Timedelta(minutes=1) not in upd_windows, (
        "event older than the watermark leaked into a closed window"
    )
    m9 = upd[upd["window_start"] == BASE + pd.Timedelta(minutes=9)]
    assert int(m9[m9["op"] == "I"]["n_events"].iloc[0]) == 2  # original + late-ok


def test_batch_twin_matches_manual_window(spark, feed):
    df = spark.read.schema(schemas.CHANGE_SCHEMA_EVOLVED).parquet(feed)
    got = (
        windowed_op_counts(df, window="1 minute", watermark="2 minutes")
        .orderBy("window_start", "op")
        .toPandas()
    )
    import pyspark.sql.functions as F

    want = (
        df.groupBy(F.window("ts", "1 minute").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "op", "n_events")
        .orderBy("window_start", "op")
        .toPandas()
    )
    assert got[["window_start", "op", "n_events"]].values.tolist() == want.values.tolist()
