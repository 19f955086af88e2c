"""Ops CLI for the in-flight cancel/upgrade protocol (T5).

Reference analogue: ETL/scripts/update_latest_task_def.py — drain the
queue onto a new job definition. Here the "queue" is the table's ledger,
so upgrade is: ``require-version`` (old drivers drain + refuse), restart
drivers on current code (they resume from the ledger automatically).

    python scripts/job_control.py stop     --table /path/t [--reason msg]
    python scripts/job_control.py require-version --table /path/t --version 2.1
    python scripts/job_control.py clear    --table /path/t
    python scripts/job_control.py status   --table /path/t
"""

from __future__ import annotations

import argparse
import json

from transcript_cdc.plans.control import JobControl


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("action", choices=["stop", "require-version", "clear", "status"])
    ap.add_argument("--table", required=True)
    ap.add_argument("--reason", default="")
    ap.add_argument("--version", default=None)
    args = ap.parse_args()

    ctl = JobControl(args.table)
    if args.action == "stop":
        print(json.dumps(ctl.request_stop(reason=args.reason)))
    elif args.action == "require-version":
        if not args.version:
            ap.error("--version is required for require-version")
        print(json.dumps(ctl.require_version(args.version)))
    elif args.action == "clear":
        ctl.clear()
        print(json.dumps({"cleared": True}))
    else:
        print(json.dumps(ctl.status()))


if __name__ == "__main__":
    main()
