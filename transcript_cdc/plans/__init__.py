from transcript_cdc.plans.ingest import CdcIngestJob, IngestConfig

__all__ = ["CdcIngestJob", "IngestConfig"]
