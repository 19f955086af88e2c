"""Chaos lifecycle: the exactly-once / resumability claims COMPOSED.

Each unit test elsewhere exercises one lifecycle event (kill/resume,
crash-mid-epoch, rollback, rebucket, compaction) in isolation. Here a
seeded random schedule interleaves all of them over one seeded feed —
fresh job objects every step, so every decision flows through the ledger —
and the table must still converge to the dict-oracle replay, byte-for-byte
per turn. This is the strongest single statement of the north rule's
"idempotent replay under operational chaos" contract:

- ingest: 1-2 epochs at a time, resumed purely from the manifest ledger;
- crash:  the newest INGEST manifest is unlinked after commit (data files
          left behind) — the reader must drop to the prior snapshot and the
          next run must redo exactly that WAL window;
- rollback: point-in-time recovery to a random surviving snapshot — the
          discarded WAL range must simply replay on the next run;
- rebucket: partition evolution mid-stream (4/8/16 buckets) — subsequent
          epochs must follow the table's layout, reads stay correct;
- compact (mor): delta chains fold into a new base generation mid-stream.
"""

from __future__ import annotations

import os
import random

import pytest

from transcript_cdc.datagen import (
    StreamSpec,
    generate_events,
    replay_oracle,
    write_change_feed,
)
from transcript_cdc.plans.ingest import CdcIngestJob, IngestConfig


def _spec(seed: int) -> StreamSpec:
    return StreamSpec(
        n_conversations=150, avg_turns=6, update_ratio=0.35,
        delete_ratio=0.08, absent_delete_ratio=0.01, zipf_s=1.2,
        out_of_order_fraction=0.2, evolution_at=0.5, seed=seed,
        events_per_file=300,
    )


def _final_triples(job: CdcIngestJob) -> list[tuple]:
    rows = job.final_state().select("conv_id", "turn_idx", "text").collect()
    return sorted((r.conv_id, int(r.turn_idx), r.text) for r in rows)


def _oracle_triples(spec: StreamSpec) -> list[tuple]:
    orc = replay_oracle(generate_events(spec), normalize=True)
    return sorted(
        zip(orc["conv_id"], (int(t) for t in orc["turn_idx"]), orc["text"])
    )


@pytest.mark.parametrize("storage,seed", [("cow", 11), ("mor", 12)])
def test_chaos_lifecycle_converges(spark, tmp_path, storage, seed):
    spec = _spec(seed)
    feed = str(tmp_path / "feed")
    write_change_feed(spec, feed)
    root = str(tmp_path / "table")
    cfg = IngestConfig(
        n_buckets=8, epoch_events=150, storage=storage, write_partitions=8
    )

    def make_job() -> CdcIngestJob:
        # a FRESH object every step: no in-process state may carry over —
        # resume decisions must come from the on-disk ledger alone
        return CdcIngestJob(spark, feed, root, cfg)

    feed_max = make_job().feed.max_lsn()
    rng = random.Random(seed * 7919)
    actions = ["ingest", "ingest", "crash", "rollback", "rebucket"]
    if storage == "mor":
        actions.append("compact")

    for _step in range(14):
        job = make_job()
        t = job.table
        action = rng.choice(actions)
        if action == "ingest":
            job.run(max_epochs=rng.randint(1, 2))
        elif action == "crash":
            # commit one epoch, then unlink its manifest (data files stay):
            # the documented crash-mid-epoch shape — commit point is the
            # manifest, so the snapshot must drop back and the next run
            # must redo exactly that WAL window
            if job.run(max_epochs=1):
                newest = t.committed_epochs()[-1]
                man = t.read_manifest(newest)
                if man["metrics"].get("mode") not in ("rebucket", "compaction"):
                    os.unlink(t._manifest_path(newest))
        elif action == "rollback":
            if t.exists():
                epochs = t.committed_epochs()
                horizon = int(
                    t.meta.get("expired_before", epochs[0] if epochs else 0)
                )
                eligible = [e for e in epochs if e >= horizon]
                if len(eligible) >= 2:
                    t.rollback(rng.choice(eligible[:-1]))
        elif action == "rebucket":
            if t.exists() and t.committed_epochs():
                t.rebucket(spark, rng.choice([4, 8, 16]), write_partitions=8)
        elif action == "compact":
            if t.exists() and t.committed_epochs():
                t.compact(spark, write_partitions=8)

    # drain whatever WAL range the chaos left unconsumed
    job = make_job()
    job.run()
    epoch, lsn_hi = job.resume_point()
    assert lsn_hi >= feed_max

    # blind re-run must be a pure no-op (exactly-once)
    assert make_job().run() == []

    assert _final_triples(make_job()) == _oracle_triples(spec)
