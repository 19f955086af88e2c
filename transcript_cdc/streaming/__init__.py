from transcript_cdc.streaming.changelog_tail import ChangelogTail
from transcript_cdc.streaming.stateful import conversation_stats_stream
from transcript_cdc.streaming.stream_ingest import (
    DrainRequested,
    StreamConfig,
    StreamingIngest,
    VERSIONED_TRANSCRIPT_SCHEMA,
)
from transcript_cdc.streaming.windows import windowed_op_counts

__all__ = [
    "ChangelogTail",
    "DrainRequested",
    "StreamConfig",
    "StreamingIngest",
    "VERSIONED_TRANSCRIPT_SCHEMA",
    "conversation_stats_stream",
    "windowed_op_counts",
]
