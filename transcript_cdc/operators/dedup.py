"""Last-writer-wins dedup — the core CDC operator (SURVEY.md §2.4 J2, J1).

The reference gets LWW implicitly: pages consumed in cursor order
(ETL/glue/arxiv_feed.py:57-82) + OpenSearch DuplicatePolicy.OVERWRITE
(ETL/batch_ecs/source/pipeline.py:53) means the last write by feed order
replaces prior state. We make the ordering explicit: a window over the
natural key ordered by lsn descending, keep row 1 — including the *op*,
so a delete that is the last event for a key survives dedup as a delete.

Scale notes: `row_number` over partitionBy(key) shuffles once on the full
composite key (conv_id, turn_idx). Hot conversations do NOT skew this
shuffle because turn_idx spreads each conversation across partitions —
skew handling is only needed where we hash on conv_id alone (see skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(
    df: DataFrame,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    order_col: str = "lsn",
) -> DataFrame:
    """Keep, per key, only the event with the highest ``order_col``.

    Within-batch LWW: the winner's full row (including op) represents the
    key's net effect for the batch. Deterministic because lsn is unique.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def union_dedup(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    score_col: str,
    tiebreak: Column | None = None,
) -> DataFrame:
    """Union two candidate sets, dedup by key keeping the max-score row.

    Mirror of Haystack DocumentJoiner concatenate-mode (reference
    search_server/src/services/search.py:35,45-47): merge BM25 + embedding
    results, keep max score per doc id. Structurally the same window-LWW
    shape as the CDC dedup, ordered by score instead of lsn.
    """
    unioned = a.unionByName(b, allowMissingColumns=True)
    order = [F.col(score_col).desc()]
    if tiebreak is not None:
        order.append(tiebreak)
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
