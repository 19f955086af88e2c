"""Downstream changelog tail — the consumer-side handle on read_changes.

The ingest side tails the WAL (sources/changes.py, the reference's feed
cursor — ETL/glue/arxiv_feed.py:57-82); this is the mirror-image cursor
for CONSUMERS of the lake table: index refreshers, cache invalidators,
IVM view refreshes (operators/ivm.py). Each ``poll()`` returns one
``(epoch, changes_df)`` per append commit since the last poll, in commit
order, and silently advances past compaction/COW rewrite commits — a
rewrite reorganizes files without logical change, and the post-rewrite
base is exactly the state the next range diffs against.

Driver-side work per poll is O(new manifests) JSON reads; the change
DataFrames are lazy (bucket-local Arrow fold, zero data shuffle — see
MergeOnReadTable.read_changes). The cursor is plain state: persist
``tail.cursor`` wherever the consumer checkpoints and reconstruct with
``from_epoch=cursor`` to resume exactly-once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ChangelogTail:
    def __init__(self, spark: SparkSession, table, from_epoch: int = -1):
        self.spark = spark
        self.table = table
        self.cursor = from_epoch

    def poll(self) -> list[tuple[int, DataFrame]]:
        """(epoch, net-changes DataFrame) for each append epoch committed
        since the last poll; advances the cursor."""
        out: list[tuple[int, DataFrame]] = []
        for e in self.table.committed_epochs():
            if e <= self.cursor:
                continue
            if self.table.read_manifest(e).get("append"):
                out.append(
                    (
                        e,
                        self.table.read_changes(
                            self.spark, from_epoch=self.cursor, to_epoch=e
                        ),
                    )
                )
            self.cursor = e
        return out
