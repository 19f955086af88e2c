"""applyInPandasWithState custom stateful operator (SURVEY §2.5 extension).

The per-conversation running stats maintained across micro-batches must,
after draining the feed, agree with a batch groupBy over the whole feed —
and state must survive a query restart from the checkpoint.
"""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd

from transcript_cdc import schemas
from transcript_cdc.datagen import StreamSpec, write_change_feed
from transcript_cdc.streaming.stateful import conversation_stats_stream

SPEC = StreamSpec(
    n_conversations=60,
    avg_turns=5,
    update_ratio=0.4,
    delete_ratio=0.1,
    seed=23,
    events_per_file=150,
)


def _truth(spark, feed_dir) -> pd.DataFrame:
    from pyspark.sql import functions as F

    full = spark.read.option("mergeSchema", "true").parquet(feed_dir)
    return (
        full.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("events_seen"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("deletes_seen"),
            F.max("lsn").alias("max_lsn"),
        )
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def _latest_emitted(rows: pd.DataFrame) -> pd.DataFrame:
    # Update mode re-emits a conversation's row each batch that touches it;
    # the final state is the emission with the highest events_seen.
    return (
        rows.sort_values(["conv_id", "events_seen"])
        .groupby("conv_id", as_index=False)
        .last()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def _run_stream(spark, feed_dir, ckpt, files_per_trigger=2) -> pd.DataFrame:
    """Drain the feed; return all emitted update rows (foreachBatch sink —
    the memory sink does not support checkpoint recovery)."""
    stream = (
        spark.readStream.schema(schemas.CHANGE_SCHEMA_EVOLVED)
        .option("maxFilesPerTrigger", str(files_per_trigger))
        .parquet(feed_dir)
    )
    emitted: list[pd.DataFrame] = []
    q = (
        conversation_stats_stream(stream)
        .writeStream.foreachBatch(lambda df, eid: emitted.append(df.toPandas()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        pd.concat(emitted, ignore_index=True)
        if emitted
        else pd.DataFrame(columns=["conv_id", "events_seen", "deletes_seen", "max_lsn", "distinct_turns_upper"])
    )


def test_stateful_stats_match_batch_truth(spark, tmp_path):
    feed = str(tmp_path / "feed")
    write_change_feed(SPEC, feed)
    emitted = _run_stream(spark, feed, str(tmp_path / "ckpt"))
    got = _latest_emitted(emitted)
    want = _truth(spark, feed)
    pd.testing.assert_frame_equal(
        got[["conv_id", "events_seen", "deletes_seen", "max_lsn"]],
        want,
        check_dtype=False,
    )


def test_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "allfiles")
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    write_change_feed(SPEC, src)
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    half = len(files) // 2
    for f in files[:half]:
        shutil.copy(f, feed)

    ckpt = str(tmp_path / "ckpt")
    first = _run_stream(spark, feed, ckpt)

    # restart with new segments: state (counts) must carry over, not reset
    for f in files[half:]:
        shutil.copy(f, feed)
    second = _run_stream(spark, feed, ckpt)

    got = _latest_emitted(pd.concat([first, second], ignore_index=True))
    want = _truth(spark, src)
    pd.testing.assert_frame_equal(
        got[["conv_id", "events_seen", "deletes_seen", "max_lsn"]],
        want,
        check_dtype=False,
    )
