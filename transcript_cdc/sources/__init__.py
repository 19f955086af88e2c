from transcript_cdc.sources.changes import ChangeFeed
from transcript_cdc.sources.lake import ParquetSnapshotTable

__all__ = ["ChangeFeed", "ParquetSnapshotTable"]
