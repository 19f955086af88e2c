"""T5 — in-flight cancel / upgrade (reference update_latest_task_def.py:
drain outdated jobs, terminate in-flight ones, resume on new code).

Covers: graceful drain at the epoch boundary, resume-after-drain equality
vs the replay oracle, the engine-version upgrade gate, hard cancel via the
job group, and control-file robustness (garbage content must not wedge)."""

from __future__ import annotations

import json
import threading

import pandas as pd
import pytest

from transcript_cdc.datagen import (
    StreamSpec,
    generate_events,
    replay_oracle,
    write_change_feed,
)
from transcript_cdc.plans.control import (
    ENGINE_VERSION,
    JobControl,
    UpgradeRequired,
    cancel_inflight,
)
from transcript_cdc.plans.ingest import CdcIngestJob, IngestConfig


SPEC = StreamSpec(
    n_conversations=100,
    avg_turns=5,
    update_ratio=0.4,
    delete_ratio=0.1,
    seed=31,
    events_per_file=400,
)
CFG = IngestConfig(n_buckets=4, epoch_events=150, normalize=False)


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    d = tmp_path_factory.mktemp("ctl_feed")
    write_change_feed(SPEC, str(d))
    oracle = replay_oracle(generate_events(SPEC), normalize=False)
    return {"dir": str(d), "oracle": oracle}


def _state(job: CdcIngestJob) -> pd.DataFrame:
    return (
        job.final_state()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


def test_graceful_drain_and_resume(spark, tmp_path, feed):
    table = str(tmp_path / "t")
    job = CdcIngestJob(spark, feed["dir"], table, CFG)
    job.run(max_epochs=2)
    ctl = JobControl(table)
    ctl.request_stop(reason="rolling to new task definition")
    # a drain request stops the loop at the boundary: no new epochs commit
    assert job.run() == []
    assert job.resume_point()[0] == 2
    # clearing the control resumes exactly where the drained job stopped
    ctl.clear()
    job2 = CdcIngestJob(spark, feed["dir"], table, CFG)
    assert len(job2.run()) > 0
    got = _state(job2)
    oracle = feed["oracle"]
    assert len(got) == len(oracle)
    assert got["text"].tolist() == oracle["text"].tolist()


def test_upgrade_gate_blocks_old_engine(spark, tmp_path, feed):
    table = str(tmp_path / "t")
    job = CdcIngestJob(spark, feed["dir"], table, CFG)
    job.run(max_epochs=1)
    ctl = JobControl(table)
    ctl.require_version("99.0")
    with pytest.raises(UpgradeRequired):
        job.run()
    # nothing committed while gated
    assert job.resume_point()[0] == 1
    # a current-or-newer engine passes the same gate
    ctl.require_version(ENGINE_VERSION)
    assert len(job.run()) > 0


def test_garbage_control_file_does_not_wedge(spark, tmp_path, feed):
    table = str(tmp_path / "t")
    job = CdcIngestJob(spark, feed["dir"], table, CFG)
    job.run(max_epochs=1)
    ctl = JobControl(table)
    ctl.request_stop()
    # simulate a non-atomic writer dying mid-write
    with open(ctl.path, "w") as f:
        f.write('{"command": "sto')
    assert ctl.status() is None and not ctl.should_stop()
    assert len(job.run()) > 0  # ingest proceeds past the garbage file


def test_request_rejects_unknown_command(tmp_path):
    with pytest.raises(ValueError):
        JobControl(str(tmp_path / "t")).request("explode")


def test_streaming_drain_and_resume(spark, tmp_path, feed):
    """T5 over the streaming path: a stop request ends the availableNow run
    at the micro-batch boundary (nothing half-committed); clearing it and
    re-running with the SAME checkpoint drains the rest exactly-once."""
    from transcript_cdc.streaming import StreamConfig, StreamingIngest

    table = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    cfg = StreamConfig(n_buckets=4, max_files_per_trigger=1, normalize=False)
    ing = StreamingIngest(spark, feed["dir"], table, ckpt, cfg)
    ing.control.request_stop(reason="drain test")
    assert ing.run_available() is False
    drained_epochs = ing.table.committed_epochs()
    assert drained_epochs == []  # stopped before the first commit

    ing.control.clear()
    assert ing.run_available() is True
    got = (
        ing.final_state()
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    oracle = feed["oracle"]
    assert len(got) == len(oracle)
    assert got["text"].tolist() == oracle["text"].tolist()


def test_hard_cancel_recovers_like_crash(spark, tmp_path, feed):
    """cancelJobGroup mid-run must leave the table at a committed epoch
    (uncommitted files are orphans); a fresh run finishes and matches the
    oracle. Timing-tolerant: if the run wins the race and completes, the
    recovery assertions still hold trivially."""
    table = str(tmp_path / "t")
    job = CdcIngestJob(spark, feed["dir"], table, CFG)
    errors: list[BaseException] = []

    def target():
        try:
            job.run()
        except BaseException as e:  # cancellation surfaces as Py4J error
            errors.append(e)

    t = threading.Thread(target=target)
    t.start()
    cancel_inflight(spark, table)
    t.join(timeout=120)
    assert not t.is_alive()

    # ledger must be a clean prefix: epochs 0..k-1 committed, each manifest
    # parseable (the rename-commit guarantees no torn manifest)
    job2 = CdcIngestJob(spark, feed["dir"], table, CFG)
    next_epoch, _ = job2.resume_point()
    for e in range(next_epoch):
        with open(job2.table._manifest_path(e)) as f:
            json.load(f)
    job2.run()
    got = _state(job2)
    oracle = feed["oracle"]
    assert len(got) == len(oracle)
    assert got["text"].tolist() == oracle["text"].tolist()
