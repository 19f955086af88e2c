"""Point reads prune FILES via manifest key-range stats, not just buckets.

At 10^10 rows a bucket holds many epoch files with mostly-disjoint key
ranges; a point read must open only the files whose [min_key, max_key]
can contain the key (`files_for_key`), then push the key into the
parquet row-group reads. These tests build a one-bucket table from two
disjoint conversation ranges (so file-level pruning is observable even
with bucket pruning degenerate) and pin:

- files_for_key returns a STRICT subset of the bucket's live files;
- COW read_conversation ≡ read_snapshot + filter;
- MOR read_conversation ≡ read_resolved + filter (fold restricted to the
  pruned chain + key row-group predicate is still LWW-correct, including
  a cross-epoch update chain and a tombstone);
- a key owned by no file returns 0 rows without error.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest

from transcript_cdc.plans.ingest import CdcIngestJob, IngestConfig

COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
TS = pd.Timestamp("2024-01-01")


def _write(path: str, rows: list, lo: int, hi: int) -> None:
    df = pd.DataFrame(rows, columns=COLS).astype(
        {"turn_idx": "int32", "tool": "string"}
    )
    df.to_parquet(
        os.path.join(path, f"part-{lo:06d}-{hi:06d}.parquet"),
        index=False,
        coerce_timestamps="us",
    )


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    """Epoch 0: conv-a000..conv-a099 inserts; epoch 1: conv-b000..conv-b099
    inserts (disjoint key range → under file-granular COW the a-file is
    carried forward untouched); epoch 2: one UPDATE + one DELETE of epoch-0
    conversations (a cross-epoch chain the MOR fold must resolve, and a
    narrow COW rewrite that leaves the b-file alone)."""
    d = str(tmp_path_factory.mktemp("prune") / "feed")
    os.makedirs(d)
    rows, lsn = [], 0
    for c in range(100):
        for t in range(2):
            rows.append((lsn, "I", f"conv-a{c:03d}", t, "user", f"a {c} {t}", None, TS))
            lsn += 1
    _write(d, rows, 0, lsn - 1)
    lo = lsn
    rows = []
    for c in range(100):
        for t in range(2):
            rows.append((lsn, "I", f"conv-b{c:03d}", t, "user", f"b {c} {t}", None, TS))
            lsn += 1
    _write(d, rows, lo, lsn - 1)
    lo = lsn
    rows = [
        (lsn, "U", "conv-a007", 1, "user", "a 7 1 v2", None, TS),
        (lsn + 1, "D", "conv-a008", 0, "user", None, None, TS),
    ]
    lsn += 2
    _write(d, rows, lo, lsn - 1)
    return {"dir": d, "epoch_events": 200}


def _job(spark, feed, storage):
    root = tempfile.mkdtemp(prefix=f"prune_{storage}_")
    job = CdcIngestJob(
        spark,
        feed["dir"],
        root,
        IngestConfig(
            n_buckets=1,
            epoch_events=feed["epoch_events"],
            write_partitions=1,
            storage=storage,
        ),
    )
    results = job.run()
    assert len(results) == 3
    return job


@pytest.fixture(scope="module")
def cow(spark, feed):
    return _job(spark, feed, "cow")


@pytest.fixture(scope="module")
def mor(spark, feed):
    return _job(spark, feed, "mor")


def _live_files(table, bucket=0):
    state, _ = table._current_state()
    return state.get(str(bucket), [])


@pytest.mark.parametrize("fixture_name", ["cow", "mor"])
def test_files_for_key_strict_subset(request, fixture_name):
    t = request.getfixturevalue(fixture_name).table
    live = _live_files(t)
    assert len(live) >= 2, "need multiple files in the bucket to observe pruning"
    pruned_a = t.files_for_key("conv-a007", 0)
    pruned_b = t.files_for_key("conv-b050", 0)
    assert set(pruned_a) <= set(live) and set(pruned_b) <= set(live)
    assert len(pruned_b) < len(live), "disjoint-range file should be skipped"
    # conv-b lives only in epoch-1 files; conv-a050 only in epoch-0 files
    # (untouched by epoch 1's narrow a-updates under file-granular COW)
    assert len(t.files_for_key("conv-a050", 0)) < len(live)


def test_cow_point_read_matches_snapshot_filter(spark, cow):
    t = cow.table
    for conv in ["conv-a007", "conv-a050", "conv-b050"]:
        got = (
            t.read_conversation(spark, conv)
            .orderBy("turn_idx")
            .select("conv_id", "turn_idx", "text")
            .collect()
        )
        want = (
            t.read_snapshot(spark)
            .filter(f"conv_id = '{conv}'")
            .orderBy("turn_idx")
            .select("conv_id", "turn_idx", "text")
            .collect()
        )
        assert got == want and len(got) == 2


def test_mor_point_read_matches_resolved_filter(spark, mor):
    t = mor.table
    # a007 turn 1 was updated in epoch 1; a008 turn 0 deleted in epoch 1 —
    # the pruned fold must still see both epochs' files for these keys.
    expect = {
        "conv-a007": [("conv-a007", 0, "a 7 0"), ("conv-a007", 1, "a 7 1 v2")],
        "conv-a008": [("conv-a008", 1, "a 8 1")],
        "conv-b050": [("conv-b050", 0, "b 50 0"), ("conv-b050", 1, "b 50 1")],
    }
    for conv, want in expect.items():
        got = [
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in t.read_conversation(spark, conv)
            .orderBy("turn_idx")
            .select("conv_id", "turn_idx", "text")
            .collect()
        ]
        assert got == want, conv
        full = [
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in t.read_resolved(spark)
            .filter(f"conv_id = '{conv}'")
            .orderBy("turn_idx")
            .select("conv_id", "turn_idx", "text")
            .collect()
        ]
        assert got == full, conv


@pytest.mark.parametrize("fixture_name", ["cow", "mor"])
def test_absent_key_reads_empty(request, spark, fixture_name):
    t = request.getfixturevalue(fixture_name).table
    assert t.read_conversation(spark, "conv-zzz").count() == 0
