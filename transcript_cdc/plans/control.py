"""T5 — in-flight job cancel / upgrade (SURVEY.md §2.5).

Reference parity: `ETL/scripts/update_latest_task_def.py:17-112` drains a
batch queue onto a new job definition — list in-flight jobs, terminate the
ones running outdated code (`terminate_job(reason=...)`, :48-53), and
resubmit the same work under the latest definition with its environment
preserved (:57-80).

Spark-first mapping — three cooperating pieces, none of which needs a
workflow service because the committed-offset ledger already IS the
resubmit queue (re-running a job resumes exactly where the last one
stopped, so "resubmit" is just "start the new binary"):

1. **Graceful drain**: a control file (``{table}/_control/control.json``,
   written atomically) that a running `CdcIngestJob.run` polls at every
   epoch boundary — a driver-side `os.path` read, zero executor cost. On
   ``stop`` the loop exits after the in-flight epoch commits; nothing is
   ever half-applied because the manifest rename is the commit point.
2. **Hard cancel**: every `run()` registers a Spark job group derived from
   the table root; `cancel_inflight(spark, table)` calls
   ``sc.cancelJobGroup`` (interruptOnCancel), killing the epoch's stages
   mid-flight. Safety is the crash-mid-epoch path already tested in
   tests/test_ingest_e2e.py: an uncommitted epoch's data files are
   invisible orphans and the next run redoes the window.
3. **Upgrade gate**: the control file may pin ``min_engine_version``. A job
   whose `ENGINE_VERSION` is older refuses to start (UpgradeRequired) —
   the reference's "only the latest task definition may run" invariant —
   while the draining old job finishes its epoch and exits. At 100 TB this
   is how you roll code without a stop-the-world: write the gate, let old
   drivers drain at their next boundary, start new drivers anywhere.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

# Bumped on storage/ledger format changes; compared lexicographically as
# tuples by _version_lt.
ENGINE_VERSION = "2.0"

CONTROL_DIR = "_control"
CONTROL_FILE = "control.json"


class UpgradeRequired(RuntimeError):
    """Raised when the table's control file pins a newer engine version."""


def _control_path(table_root: str) -> str:
    return os.path.join(table_root, CONTROL_DIR, CONTROL_FILE)


def _version_tuple(v: str) -> tuple[int, ...]:
    return tuple(int(p) for p in str(v).split("."))


def _version_lt(a: str, b: str) -> bool:
    return _version_tuple(a) < _version_tuple(b)


def job_group(table_root: str) -> str:
    """Stable job-group id for all Spark jobs of one table's ingest."""
    return f"cdc-ingest:{os.path.normpath(table_root)}"


class JobControl:
    """Control-file protocol for one table root."""

    def __init__(self, table_root: str):
        self.table_root = table_root
        self.path = _control_path(table_root)

    # ---------- writes (the operator side) ----------

    def request(self, command: str, **meta) -> dict:
        """Write a control request atomically (tmp+rename, same discipline
        as manifest commits). Known commands: ``stop``, ``run``."""
        if command not in ("stop", "run"):
            raise ValueError(f"unknown control command {command!r}")
        doc = {"command": command, "requested_at": time.time(), **meta}
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(tmp, self.path)
        return doc

    def request_stop(self, reason: str = "") -> dict:
        return self.request("stop", reason=reason)

    def require_version(self, min_engine_version: str) -> dict:
        """Pin the minimum engine version; outdated drivers drain+refuse.
        The command stays ``run`` — current-version jobs keep working."""
        return self.request("run", min_engine_version=min_engine_version)

    def clear(self) -> None:
        if os.path.exists(self.path):
            os.unlink(self.path)

    # ---------- reads (the running-job side) ----------

    def status(self) -> dict | None:
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None
        except json.JSONDecodeError:
            # half-written by a non-atomic writer: treat as absent rather
            # than wedging the ingest loop; the writer will retry.
            return None

    def should_stop(self) -> bool:
        st = self.status()
        return bool(st) and st.get("command") == "stop"

    def check_version(self, engine_version: str = ENGINE_VERSION) -> None:
        """Raise UpgradeRequired if the control file pins a newer engine."""
        st = self.status() or {}
        pin = st.get("min_engine_version")
        if pin and _version_lt(engine_version, pin):
            raise UpgradeRequired(
                f"table {self.table_root} requires engine >= {pin}, "
                f"this driver is {engine_version}; restart on current code "
                f"(the ledger resumes it exactly where this one stopped)"
            )


def cancel_inflight(spark: SparkSession, table_root: str) -> None:
    """Hard-cancel the in-flight epoch's Spark jobs (reference
    terminate_job, update_latest_task_def.py:48-53). The uncommitted
    epoch's files are orphans; the next run() redoes that LSN window."""
    spark.sparkContext.cancelJobGroup(job_group(table_root))
