"""Cluster entry point for the CDC ingest job (shipped by scripts/submit.sh).

Reads the committed-offset ledger, replays the WAL forward in epoch windows,
commits per-partition manifests — resumable by just re-running (the ledger
is the cursor; re-running a committed epoch is a no-op).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--changes", required=True)
    ap.add_argument("--table", required=True)
    ap.add_argument("--storage", default="cow", choices=["cow", "mor"])
    ap.add_argument("--epoch-events", type=int, default=100_000_000)
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--write-partitions", type=int, default=None)
    ap.add_argument("--compact-every", type=int, default=8)
    # compact only buckets fragmented past this chain length (0 = all);
    # on a long-running feed this keeps maintenance cost ∝ fragmentation
    ap.add_argument("--compact-min-files", type=int, default=0)
    ap.add_argument("--max-epochs", type=int, default=None)
    args = ap.parse_args()

    # On a cluster, spark-submit provides master/deploy; builder only adds app name.
    spark = SparkSession.builder.appName("transcript-cdc-ingest").getOrCreate()

    from transcript_cdc.plans.ingest import CdcIngestJob, IngestConfig

    cfg = IngestConfig(
        n_buckets=args.n_buckets,
        epoch_events=args.epoch_events,
        write_partitions=args.write_partitions,
        storage=args.storage,
        compact_every=args.compact_every if args.storage == "mor" else 0,
        compact_min_files=args.compact_min_files,
    )
    job = CdcIngestJob(spark, args.changes, args.table, cfg)
    results = job.run(max_epochs=args.max_epochs)
    print(json.dumps({"epochs_processed": len(results), "results": results[-3:]}))
    spark.stop()


if __name__ == "__main__":
    main()
