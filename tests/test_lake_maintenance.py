"""Lake-table maintenance semantics (round-1 advice items).

- MOR manifests are per-epoch deltas: each append manifest lists only the
  files its epoch added (no O(epochs²) cumulative re-listing), and the
  read-time fold reconstructs the full state.
- expire() garbage-collects files unreachable from kept snapshots, in both
  storage modes, without disturbing the current state; expired time-travel
  epochs refuse to read instead of returning partial data.
- Streaming exactly-once guard is bound to the checkpoint identity: a fresh
  checkpoint over a populated table fails fast, and an epoch committed by a
  different checkpoint refuses to skip.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from transcript_cdc import schemas
from transcript_cdc.datagen import StreamSpec, generate_events, replay_oracle, write_change_feed
from transcript_cdc.plans.ingest import CdcIngestJob, IngestConfig
from transcript_cdc.streaming import StreamConfig, StreamingIngest

SPEC = StreamSpec(
    n_conversations=60, avg_turns=5, update_ratio=0.5, delete_ratio=0.1,
    zipf_s=1.2, out_of_order_fraction=0.2, seed=31, events_per_file=200,
)


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    d = tmp_path_factory.mktemp("maint_feed")
    write_change_feed(SPEC, str(d))
    oracle = replay_oracle(generate_events(SPEC), normalize=True)
    return {"dir": str(d), "oracle": oracle}


def _sorted_state(df):
    return (
        df.toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


def _data_files(root):
    return set(glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True))


def test_mor_manifests_are_per_epoch_deltas(spark, feed, tmp_path):
    root = str(tmp_path / "t")
    job = CdcIngestJob(
        spark, feed["dir"], root,
        IngestConfig(n_buckets=4, epoch_events=150, storage="mor"),
    )
    job.run()
    epochs = job.table.committed_epochs()
    assert len(epochs) >= 3
    all_files = []
    for e in epochs:
        m = job.table.read_manifest(e)
        assert m["append"] is True
        listed = [f for files in m["buckets"].values() for f in files]
        # per-epoch manifests list only their own epoch's files
        assert all(f"epoch={e:010d}" in f for f in listed)
        all_files.extend(listed)
    # no file listed twice across manifests, and the fold sees all of them
    assert len(all_files) == len(set(all_files))
    state, _ = job.table._current_state()
    folded = [f for files in state.values() for f in files]
    assert sorted(folded) == sorted(all_files)
    # final state still matches the oracle
    eng = _sorted_state(job.final_state())
    assert eng["text"].tolist() == feed["oracle"]["text"].tolist()


def test_expire_after_compaction_removes_superseded_deltas(spark, feed, tmp_path):
    root = str(tmp_path / "t")
    job = CdcIngestJob(
        spark, feed["dir"], root,
        IngestConfig(n_buckets=4, epoch_events=150, storage="mor"),
    )
    job.run()
    job.table.compact(spark)
    before = _data_files(root)
    eng_before = _sorted_state(job.final_state())

    res = job.table.expire()
    after = _data_files(root)
    assert res["removed_files"] > 0
    assert after < before  # strictly fewer files on disk
    # current state unchanged, still oracle-equal
    eng_after = _sorted_state(job.final_state())
    assert eng_after["text"].tolist() == eng_before["text"].tolist()
    assert eng_after["text"].tolist() == feed["oracle"]["text"].tolist()
    # expired time travel refuses; the kept (latest) epoch still reads
    last = job.table.committed_epochs()[-1]
    assert job.table.read_snapshot(spark, as_of_epoch=last).count() > 0
    with pytest.raises(ValueError, match="expire"):
        job.table.read_snapshot(spark, as_of_epoch=0)


def test_expire_on_cow_removes_old_generations(spark, feed, tmp_path):
    root = str(tmp_path / "t")
    job = CdcIngestJob(
        spark, feed["dir"], root,
        IngestConfig(n_buckets=4, epoch_events=150, storage="cow"),
    )
    job.run()
    assert len(job.table.committed_epochs()) >= 3
    before = _data_files(root)
    res = job.table.expire()
    assert res["removed_files"] > 0
    assert _data_files(root) < before
    eng = _sorted_state(job.final_state())
    assert eng["text"].tolist() == feed["oracle"]["text"].tolist()


def test_expire_on_compact_config_wires_through(spark, feed, tmp_path):
    root = str(tmp_path / "t")
    job = CdcIngestJob(
        spark, feed["dir"], root,
        IngestConfig(
            n_buckets=4, epoch_events=150, storage="mor",
            compact_every=2, expire_on_compact=True,
        ),
    )
    job.run()
    # every file on disk is referenced by the current fold (GC ran)
    state, _ = job.table._current_state()
    referenced = {
        os.path.join(root, f) for files in state.values() for f in files
    }
    assert _data_files(root) <= referenced | set()
    eng = _sorted_state(job.final_state())
    assert eng["text"].tolist() == feed["oracle"]["text"].tolist()


def _fabricate_checkpoint(path: str, qid: str):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "metadata"), "w") as f:
        json.dump({"id": qid}, f)


def test_fresh_checkpoint_over_populated_table_fails_fast(spark, feed, tmp_path):
    table, ckpt1 = str(tmp_path / "table"), str(tmp_path / "ckpt1")
    ingest = StreamingIngest(
        spark, feed["dir"], table, ckpt1, StreamConfig(n_buckets=4)
    )
    ingest.run_available()
    assert ingest.table.committed_epochs()
    # same checkpoint: fine (restart path)
    StreamingIngest(spark, feed["dir"], table, ckpt1, StreamConfig(n_buckets=4))
    # fresh checkpoint whose batch ids would restart at 0: refuse
    with pytest.raises(ValueError, match="fresh"):
        StreamingIngest(
            spark, feed["dir"], table, str(tmp_path / "ckpt2"),
            StreamConfig(n_buckets=4),
        )


def test_epoch_from_other_checkpoint_refuses_to_skip(spark, feed, tmp_path):
    events = generate_events(SPEC).iloc[:200]
    batch_df = spark.createDataFrame(events, schema=schemas.CHANGE_SCHEMA_EVOLVED)

    table = str(tmp_path / "table")
    ckpt_a, ckpt_b = str(tmp_path / "a"), str(tmp_path / "b")
    _fabricate_checkpoint(ckpt_a, "query-a")
    _fabricate_checkpoint(ckpt_b, "query-b")

    ia = StreamingIngest(spark, feed["dir"], table, ckpt_a, StreamConfig(n_buckets=4))
    assert ia.apply_batch(batch_df, 0).get("keys", 0) > 0
    # same checkpoint re-delivery: idempotent skip
    assert ia.apply_batch(batch_df, 0)["skipped"] == "already-committed"
    # different checkpoint colliding on epoch 0: hard error, never a skip
    ib = StreamingIngest(spark, feed["dir"], table, ckpt_b, StreamConfig(n_buckets=4))
    with pytest.raises(RuntimeError, match="different writer"):
        ib.apply_batch(batch_df, 0)
