from transcript_cdc.plans.control import (
    ENGINE_VERSION,
    JobControl,
    UpgradeRequired,
    cancel_inflight,
)
from transcript_cdc.plans.ingest import CdcIngestJob, IngestConfig

__all__ = [
    "CdcIngestJob",
    "IngestConfig",
    "JobControl",
    "UpgradeRequired",
    "cancel_inflight",
    "ENGINE_VERSION",
]
