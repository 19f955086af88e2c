"""Changelog (read_changes) semantics + incremental view maintenance.

read_changes is the engine's Delta-CDF/Iceberg-changelog equivalent
(sources/lake.py); ivm.maintained_agg consumes it. The load-bearing
invariants: net-change classification with before/after images, late LWW
losers and deletes-of-nothing emit nothing, compaction commits poison a
range, and the IVM identity
    merge(agg(state@e0), delta(changes e0→e1)) == agg(state@e1)
including group-moving updates and groups that empty out.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from transcript_cdc.operators.ivm import (
    changes_delta,
    group_agg,
    maintained_agg,
    merge_agg_state,
)
from transcript_cdc.sources.lake import BUCKET_COL, MergeOnReadTable, bucket_expr

DDL = "conv_id string, turn_idx long, text string, score double, lsn long, op string"


def _commit(t, spark, epoch, rows, lo, hi):
    schema = StructType.fromDDL(DDL)
    delta = spark.createDataFrame(rows, schema).withColumn(
        BUCKET_COL, bucket_expr(t.n_buckets, "conv_id")
    )
    t.commit_epoch(
        epoch, delta, list(range(t.n_buckets)), lo, hi, schema, append=True
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = MergeOnReadTable.create(
        str(tmp_path / "t"), StructType.fromDDL(DDL), n_buckets=2
    )
    _commit(
        t, spark, 0,
        [
            ("c1", 0, "a", 1.0, 1, "U"),
            ("c1", 1, "b", 2.0, 2, "U"),
            ("c2", 0, "c", 3.0, 3, "U"),
            ("c3", 0, "d", 4.0, 4, "U"),
        ],
        -1, 4,
    )
    _commit(
        t, spark, 1,
        [
            ("c1", 0, "a2", 10.0, 10, "U"),  # update, moves score bin 1→10
            ("c1", 1, None, None, 11, "D"),  # delete (empties bin 2)
            ("c4", 0, "e", 5.0, 12, "U"),    # insert
            ("c2", 0, "late", 9.0, 2, "U"),  # late: loses LWW to lsn=3
            ("c9", 0, None, None, 13, "D"),  # delete of a key never live
        ],
        4, 13,
    )
    return t


def test_changelog_classification_and_images(spark, table):
    ch = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in table.read_changes(spark, from_epoch=0, to_epoch=1).collect()
    }
    # exactly the three net changes — no late loser, no delete-of-nothing
    assert set(ch) == {("c1", 0), ("c1", 1), ("c4", 0)}
    up = ch[("c1", 0)]
    assert up["change_type"] == "update"
    assert (up["text_before"], up["text_after"]) == ("a", "a2")
    assert (up["score_before"], up["score_after"]) == (1.0, 10.0)
    de = ch[("c1", 1)]
    assert de["change_type"] == "delete"
    assert de["text_before"] == "b" and de["text_after"] is None
    ins = ch[("c4", 0)]
    assert ins["change_type"] == "insert"
    assert ins["text_before"] is None and ins["text_after"] == "e"


def test_changelog_range_with_compaction_raises(spark, table):
    table.compact(spark)  # epoch 2: rewrite commit
    with pytest.raises(ValueError, match="rewrite"):
        table.read_changes(spark, from_epoch=0).collect()
    # but a post-compaction append range is readable again
    _commit(table, spark, 3, [("c5", 0, "f", 6.0, 20, "U")], 13, 20)
    rows = table.read_changes(spark, from_epoch=2, to_epoch=3).collect()
    assert [r["change_type"] for r in rows] == ["insert"]


GROUP_DEFS = {"bin": lambda col: F.floor(col("score")).cast("long")}


def _canon(df):
    return sorted(
        (r["bin"], r["cnt"], round(r["sum_score"], 9))
        for r in df.collect()
    )


def test_ivm_matches_recompute(spark, table):
    inc = maintained_agg(
        spark, table, GROUP_DEFS, ["score"], from_epoch=0, to_epoch=1
    )
    direct = group_agg(
        table.read_resolved(spark, as_of_epoch=1), GROUP_DEFS, ["score"]
    )
    got = _canon(inc)
    assert got == _canon(direct)
    bins = {b for b, _, _ in got}
    assert 2 not in bins  # the only bin-2 row was deleted → group removed
    assert 10 in bins and 1 not in bins  # update moved the row's group


def test_ivm_delta_signs(spark, table):
    ch = table.read_changes(spark, from_epoch=0, to_epoch=1)
    d = {
        r["bin"]: (r["d_cnt"], r["d_sum_score"])
        for r in changes_delta(
            ch, GROUP_DEFS, ["score"], key_cols=table.key_cols
        ).collect()
    }
    assert d[1] == (-1, -1.0)   # update debits the old group...
    assert d[10] == (1, 10.0)   # ...and credits the new one
    assert d[2] == (-1, -2.0)   # delete debits
    assert d[5] == (1, 5.0)     # insert credits


def test_changelog_across_schema_evolution(spark, table):
    """An epoch that ADDS a column (additive evolution) still classifies
    cleanly: old before-images carry null for the new column; the new
    column's images flow through like any value column."""
    ddl2 = DDL + ", tool string"
    schema2 = StructType.fromDDL(ddl2)
    delta = spark.createDataFrame(
        [
            ("c1", 0, "a3", 20.0, 30, "U", "search"),  # update of updated row
            ("c6", 0, "g", 7.0, 31, "U", None),        # insert, tool null
        ],
        schema2,
    ).withColumn(BUCKET_COL, bucket_expr(table.n_buckets, "conv_id"))
    table.commit_epoch(
        2, delta, list(range(table.n_buckets)), 13, 31, schema2, append=True
    )
    ch = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in table.read_changes(spark, from_epoch=1, to_epoch=2).collect()
    }
    assert set(ch) == {("c1", 0), ("c6", 0)}
    up = ch[("c1", 0)]
    assert up["change_type"] == "update"
    assert (up["text_before"], up["text_after"]) == ("a2", "a3")
    assert up["tool_before"] is None and up["tool_after"] == "search"
    assert ch[("c6", 0)]["change_type"] == "insert"


def test_changelog_tail_polls_new_epochs_and_skips_compaction(spark, table):
    from transcript_cdc.streaming.changelog_tail import ChangelogTail

    tail = ChangelogTail(spark, table, from_epoch=0)
    first = tail.poll()
    assert [e for e, _ in first] == [1]
    assert first[0][1].count() == 3  # the epoch-1 net changes
    assert tail.poll() == []  # nothing new → empty, cursor stays

    table.compact(spark)  # epoch 2: rewrite — must be skipped, not raise
    _commit(table, spark, 3, [("c5", 0, "f", 6.0, 20, "U")], 13, 20)
    nxt = tail.poll()
    assert [e for e, _ in nxt] == [3]
    assert [r["change_type"] for r in nxt[0][1].collect()] == ["insert"]
    assert tail.cursor == 3


def test_ivm_empty_changelog_is_identity(spark, table):
    state = group_agg(
        table.read_resolved(spark, as_of_epoch=1), GROUP_DEFS, ["score"]
    )
    empty = table.read_changes(spark, from_epoch=1, to_epoch=1)
    delta = changes_delta(empty, GROUP_DEFS, ["score"], key_cols=table.key_cols)
    merged = merge_agg_state(state, delta, ["bin"], ["score"])
    assert _canon(merged) == _canon(state)


def test_changelog_tail_reseed_after_expired_history(spark, table):
    """Catch-up across compaction + expiry (the T2 consumer story): a tail
    whose cursor predates the expire() horizon gets ChangelogGap with the
    reseed recourse; reseed() emits the full current state as insert rows
    (null before-images, live lsn), after which per-epoch tailing resumes
    and converges to the same replica state as a never-behind consumer."""
    from transcript_cdc.streaming.changelog_tail import ChangelogGap, ChangelogTail

    table.compact(spark)            # epoch 2: rewrite
    table.expire()                  # drop pre-compaction snapshots
    assert int(table.meta["expired_before"]) > 0

    stale = ChangelogTail(spark, table, from_epoch=0)  # consumer left at 0
    with pytest.raises(ChangelogGap, match="reseed"):
        stale.poll()

    epoch, seed = stale.reseed()
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in seed.collect()}
    live = {
        (r["conv_id"], r["turn_idx"]): r.asDict()
        for r in table.read_resolved(spark, with_version_cols=True).collect()
    }
    assert set(rows) == set(live) and len(rows) > 0
    for k, r in rows.items():
        assert r["change_type"] == "insert"
        assert r["text_before"] is None and r["score_before"] is None
        assert r["text_after"] == live[k]["text"]
        assert r["lsn"] == live[k]["lsn"]
    assert stale.cursor == epoch

    # tailing resumes: a post-reseed append arrives as a normal diff
    _commit(table, spark, 3, [("c7", 0, "g", 7.0, 30, "U")], 13, 30)
    nxt = stale.poll()
    assert [e for e, _ in nxt] == [3]
    got = nxt[0][1].collect()
    assert [r["change_type"] for r in got] == ["insert"]
    assert got[0]["conv_id"] == "c7"


def test_changelog_tail_auto_reseed_inline(spark, table):
    from transcript_cdc.streaming.changelog_tail import ChangelogTail

    table.compact(spark)
    table.expire()
    _commit(table, spark, 3, [("c8", 0, "h", 8.0, 31, "U")], 13, 31)
    tail = ChangelogTail(spark, table, from_epoch=0, auto_reseed=True)
    out = tail.poll()
    # the reseed snapshots the LATEST state (epoch 3, so it already
    # contains c8) and the cursor lands there — one tuple, all inserts
    assert [e for e, _ in out] == [3]
    seed = out[0][1]
    assert seed.filter(F.col("change_type") != "insert").count() == 0
    assert seed.filter(F.col("conv_id") == "c8").count() == 1
    assert tail.cursor == 3


def test_rewrite_gap_error_names_restart_epoch(spark, table):
    from transcript_cdc.sources.lake import ChangelogRewriteGap

    table.compact(spark)  # epoch 2: rewrite
    _commit(table, spark, 3, [("c5", 0, "f", 6.0, 20, "U")], 13, 20)
    with pytest.raises(ChangelogRewriteGap) as ei:
        table.read_changes(spark, from_epoch=0).collect()
    assert ei.value.restart_epoch == 2
    # the documented recourse works: read from the rewrite epoch onward
    rows = table.read_changes(spark, from_epoch=2, to_epoch=3).collect()
    assert [r["change_type"] for r in rows] == ["insert"]

    # multiple rewrites in range: the error names the EARLIEST one, so the
    # hinted prefix (from_epoch, restart_epoch-1] is append-only on the
    # first try — no iterated exceptions (round-3 advice)
    table.compact(spark)  # epoch 4: second rewrite
    _commit(table, spark, 5, [("c6", 0, "g", 7.0, 21, "U")], 14, 21)
    with pytest.raises(ChangelogRewriteGap) as ei2:
        table.read_changes(spark, from_epoch=0).collect()
    assert ei2.value.restart_epoch == 2
    # and the prefix hinted by the message is readable without raising
    table.read_changes(spark, from_epoch=0, to_epoch=1).collect()
