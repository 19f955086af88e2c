"""Incremental view maintenance (IVM) over the changelog — keep a grouped
aggregate current by applying net changes, never rescanning the table.

The reference keeps its OpenSearch index current by re-pushing changed
documents, not by rebuilding the index (ETL/batch_ecs/source/pipeline.py:
51-54 OVERWRITE upserts); IVM is the same idea for aggregates: a downstream
materialized view (per-group counts/sums powering dashboards or routing)
consumes ``MergeOnReadTable.read_changes`` and folds the deltas into its
state. Cost per refresh is O(|changes|) + a join against the (small) state
— at 10^10 rows the alternative, re-aggregating the table, is a full scan
plus full shuffle per refresh.

Shape: each change row contributes up to two signed images — (-1, before)
when the key was live before, (+1, after) when it is live after — so
updates that MOVE a row between groups (the group key is derived from a
value column) debit the old group and credit the new one in the same pass.
The delta aggregate shuffles only |changes| rows; the state merge is a
full-outer join on the group key (state is per-group, orders of magnitude
smaller than the table). Correctness invariant (asserted in
tests/test_ivm.py and the ``ivm_agg_events`` driver query):

    merge(agg(state@e0), delta(changes e0→e1)) == agg(state@e1)

i.e. the incremental path equals the recompute exactly, including groups
that empty out (count reaches 0 → row removed).

Group definitions are *column-accessor functions*: ``{name: fn}`` where
``fn(col)`` builds the group expression through ``col("value")`` — the
same definition evaluates against a table row (``col = F.col``), the
changelog's before image, and its after image.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COUNT_COL = "cnt"

GroupDefs = Mapping[str, Callable[[Callable[[str], Column]], Column]]


def group_agg(
    df: DataFrame, group_defs: GroupDefs, sum_cols: Sequence[str]
) -> DataFrame:
    """Direct (full recompute) form of the maintained view: per-group
    count + sums."""
    g = [fn(F.col).alias(name) for name, fn in group_defs.items()]
    return df.groupBy(*g).agg(
        F.count(F.lit(1)).alias(COUNT_COL),
        *[F.sum(F.col(c)).alias(f"sum_{c}") for c in sum_cols],
    )


def changes_delta(
    changes: DataFrame,
    group_defs: GroupDefs,
    sum_cols: Sequence[str],
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold a changelog (read_changes output: change_type, key columns,
    ``{c}_before``/``{c}_after`` images) into per-group signed deltas.

    ``key_cols`` are the table's merge keys — immutable across a change,
    present unsuffixed in the changelog, and resolved as-is by both image
    accessors. One narrow shuffle on the group key over |changes| rows.
    """

    def accessor(suffix: str) -> Callable[[str], Column]:
        return lambda c: F.col(c if c in key_cols else f"{c}{suffix}")

    def image(sgn: int, acc: Callable[[str], Column]) -> Column:
        return F.struct(
            F.lit(sgn).alias("__sgn"),
            *[fn(acc).alias(n) for n, fn in group_defs.items()],
            *[acc(c).alias(c) for c in sum_cols],
        )

    ct = F.col("change_type")
    sides = F.filter(
        F.array(
            F.when(ct != "insert", image(-1, accessor("_before"))),
            F.when(ct != "delete", image(1, accessor("_after"))),
        ),
        lambda s: s.isNotNull(),
    )
    img = changes.select(F.explode(sides).alias("__img")).select("__img.*")
    return img.groupBy(*group_defs.keys()).agg(
        F.sum("__sgn").alias(f"d_{COUNT_COL}"),
        *[
            F.sum(F.col("__sgn") * F.col(c)).alias(f"d_sum_{c}")
            for c in sum_cols
        ],
    )


def merge_agg_state(
    state: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """state ⊕ delta: full-outer join on the group key, add measures,
    drop groups whose count reaches zero."""
    merged = state.join(delta, on=list(group_cols), how="full_outer")
    zero = F.lit(0)
    return merged.select(
        *group_cols,
        (
            F.coalesce(F.col(COUNT_COL), zero)
            + F.coalesce(F.col(f"d_{COUNT_COL}"), zero)
        ).alias(COUNT_COL),
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
                + F.coalesce(F.col(f"d_sum_{c}"), F.lit(0.0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    ).filter(F.col(COUNT_COL) > 0)


def maintained_agg(
    spark,
    table,
    group_defs: GroupDefs,
    sum_cols: Sequence[str],
    from_epoch: int,
    to_epoch: int | None = None,
) -> DataFrame:
    """The maintained view at ``to_epoch``, built incrementally: aggregate
    the resolved state at ``from_epoch`` once, then fold only the
    changelog of (from_epoch, to_epoch]."""
    base = table.read_resolved(spark, as_of_epoch=from_epoch)
    state = group_agg(base, group_defs, sum_cols)
    ch = table.read_changes(spark, from_epoch=from_epoch, to_epoch=to_epoch)
    delta = changes_delta(ch, group_defs, sum_cols, key_cols=table.key_cols)
    return merge_agg_state(state, delta, list(group_defs), sum_cols)
