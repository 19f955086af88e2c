from transcript_cdc.streaming.stream_ingest import (
    StreamConfig,
    StreamingIngest,
    VERSIONED_TRANSCRIPT_SCHEMA,
)

__all__ = ["StreamConfig", "StreamingIngest", "VERSIONED_TRANSCRIPT_SCHEMA"]
