"""Structured Streaming ingest tests (SURVEY §2.5 T2/T4/T6).

The streaming path must reach the same final state as the dict oracle:
- full-drain availableNow replay,
- restart with an existing checkpoint + late-arriving WAL segments
  (incremental catch-up, no reprocessing of consumed files),
- idempotent re-delivery of an epoch (exactly-once sink guard),
- out-of-order micro-batch delivery (versioned merge + tombstones) —
  a case the sequential batch epoch loop never faces.
"""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd
import pytest

from transcript_cdc import schemas
from transcript_cdc.datagen import StreamSpec, generate_events, replay_oracle, write_change_feed
from transcript_cdc.streaming import StreamConfig, StreamingIngest

SPEC = StreamSpec(
    n_conversations=80,
    avg_turns=5,
    update_ratio=0.5,
    delete_ratio=0.15,
    absent_delete_ratio=0.03,
    zipf_s=1.3,
    out_of_order_fraction=0.3,
    evolution_at=0.5,
    seed=11,
    events_per_file=100,
)

COMPARE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "model"]


@pytest.fixture(scope="module")
def stream_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_feed")
    info = write_change_feed(SPEC, str(d))
    events = generate_events(SPEC)
    oracle = replay_oracle(events, normalize=True)
    return {"dir": str(d), "info": info, "events": events, "oracle": oracle}


def _state(ingest: StreamingIngest) -> pd.DataFrame:
    return (
        ingest.final_state()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


def _assert_matches(engine: pd.DataFrame, oracle: pd.DataFrame):
    assert len(engine) == len(oracle), (len(engine), len(oracle))
    for col in COMPARE_COLS:
        e = engine[col].where(engine[col].notna(), None).tolist()
        o = oracle[col].where(oracle[col].notna(), None).tolist()
        assert e == o, f"mismatch in column {col}"
    e_tok = [None if pd.isna(x) else int(x) for x in engine["tokens"]]
    o_tok = [None if pd.isna(x) else int(x) for x in oracle["tokens"]]
    assert e_tok == o_tok


def test_stream_full_drain_matches_oracle(spark, stream_data, tmp_path):
    ingest = StreamingIngest(
        spark,
        stream_data["dir"],
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        StreamConfig(n_buckets=8, max_files_per_trigger=3),
    )
    ingest.run_available()
    assert len(ingest.table.committed_epochs()) > 1  # really micro-batched
    _assert_matches(_state(ingest), stream_data["oracle"])


def test_stream_restart_and_late_segments(spark, stream_data, tmp_path):
    """First drain sees only the early WAL segments; segments arriving after
    a restart are caught up incrementally from the same checkpoint."""
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    files = sorted(glob.glob(os.path.join(stream_data["dir"], "*.parquet")))
    assert len(files) >= 4
    half = len(files) // 2
    for f in files[:half]:
        shutil.copy(f, feed_dir)

    table, ckpt = str(tmp_path / "table"), str(tmp_path / "ckpt")
    cfg = StreamConfig(n_buckets=8, max_files_per_trigger=2)
    ingest = StreamingIngest(spark, feed_dir, table, ckpt, cfg)
    ingest.run_available()
    epochs_first = set(ingest.table.committed_epochs())

    # partial state == oracle of the consumed lsn prefix
    max_lsn_half = int(
        pd.concat([pd.read_parquet(f, columns=["lsn"]) for f in files[:half]])[
            "lsn"
        ].max()
    )
    partial_oracle = replay_oracle(
        stream_data["events"][stream_data["events"]["lsn"] <= max_lsn_half],
        normalize=True,
    )
    _assert_matches(_state(ingest), partial_oracle)

    # late segments arrive; a NEW StreamingIngest (fresh "process") resumes
    # from the checkpoint and consumes only the new files
    for f in files[half:]:
        shutil.copy(f, feed_dir)
    ingest2 = StreamingIngest(spark, feed_dir, table, ckpt, cfg)
    ingest2.run_available()
    assert set(ingest2.table.committed_epochs()) > epochs_first
    _assert_matches(_state(ingest2), stream_data["oracle"])


def test_apply_batch_redelivery_is_noop(spark, stream_data, tmp_path):
    """The exactly-once guard: foreachBatch re-delivery of a committed
    epoch_id (what Spark does after a crash between sink-commit and
    checkpoint-commit) must not double-apply."""
    ingest = StreamingIngest(
        spark,
        stream_data["dir"],
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        StreamConfig(n_buckets=4),
    )
    batch_pdf = stream_data["events"].iloc[:500]
    batch = spark.createDataFrame(batch_pdf, schema=schemas.CHANGE_SCHEMA_EVOLVED)
    r1 = ingest.apply_batch(batch, 0)
    assert r1.get("keys", 0) > 0
    state_after_first = _state(ingest)
    r2 = ingest.apply_batch(batch, 0)
    assert r2.get("skipped") == "already-committed"
    pd.testing.assert_frame_equal(_state(ingest), state_after_first)


def test_stream_file_granular_merge_keeps_untouched_files(spark, stream_data, tmp_path):
    """A micro-batch touching ONE conversation must not rewrite its whole
    bucket: the manifest records carried-forward (kept) files, the rewrite
    set is a strict subset, and the state still matches the dict oracle —
    the streaming twin of the batch path's file-granular COW."""
    ingest = StreamingIngest(
        spark,
        stream_data["dir"],
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        StreamConfig(n_buckets=4),
    )
    ev = stream_data["events"]
    seed = ev.iloc[: len(ev) // 2]
    ingest.apply_batch(
        spark.createDataFrame(seed, schema=schemas.CHANGE_SCHEMA_EVOLVED), 0
    )
    state0, _ = ingest.table._current_state()
    assert any(len(fl) > 1 for fl in state0.values())  # range-clustered files

    conv = seed.iloc[0]["conv_id"]
    sub = seed[seed["conv_id"] == conv].copy()
    sub["lsn"] = sub["lsn"] + 10_000_000
    ingest.apply_batch(
        spark.createDataFrame(sub, schema=schemas.CHANGE_SCHEMA_EVOLVED), 1
    )
    m = ingest.table.read_manifest(1)
    assert m["metrics"]["files_kept"] > 0
    total_before = sum(len(fl) for fl in state0.values())
    assert m["metrics"]["files_rewritten"] < total_before
    oracle = replay_oracle(pd.concat([seed, sub]), normalize=True)
    _assert_matches(_state(ingest), oracle)


def test_out_of_order_micro_batches(spark, stream_data, tmp_path):
    """Micro-batches applied in scrambled lsn order still converge to the
    oracle: the versioned merge resolves by max lsn and delete tombstones
    outlast stragglers — the semantic the sequential epoch loop gets from
    ordering, recovered here without it."""
    ingest = StreamingIngest(
        spark,
        stream_data["dir"],
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        StreamConfig(n_buckets=4),
    )
    events = stream_data["events"]
    n = len(events)
    cuts = [0, n // 4, n // 2, 3 * n // 4, n]
    slices = [events.iloc[cuts[i] : cuts[i + 1]] for i in range(4)]
    for epoch, idx in enumerate([2, 0, 3, 1]):  # scrambled delivery order
        batch = spark.createDataFrame(
            slices[idx], schema=schemas.CHANGE_SCHEMA_EVOLVED
        )
        ingest.apply_batch(batch, epoch)
    _assert_matches(_state(ingest), stream_data["oracle"])
