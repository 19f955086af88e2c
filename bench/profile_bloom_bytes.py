"""Deterministic BYTE receipt for the bloom-vs-SMJ survivor regime at the
>16M-key merge shape (the bloom A/B's own feed).

Motivation: after the round-5 codec flips (zstd shuffle + zstd parquet),
the re-run bloom A/B (`bench/ab_result_bloom.json`) shows the SMJ
fallback WINNING the tmpfs wall clock at 18M keys (median 81.0s vs
135.2s merge epoch) — the codec halved SMJ's dominant cost (full-snapshot
shuffle bytes) while bloom's costs (double snapshot scan, Arrow probe)
shrank less. But local wall on a tmpfs shuffle is exactly the metric the
codec decisions themselves rejected: at 100 TB the scaling term is BYTES
MOVED (network shuffle, lake-file re-reads). This harness extracts the
per-variant byte counters from Spark event logs — identical task DAGs
make them deterministic, immune to host weather — so the regime-default
decision can weigh the cluster-shaped term against the sandbox-shaped
one. See CHANGES_r5.md for the verdict this produced.

Usage: python bench/profile_bloom_bytes.py [--events 44000000] [--cores 8]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "bench"))

from profile_epoch import parse_eventlog, run_replay  # noqa: E402
from bloom_ab import pregenerate_low_churn_feed  # noqa: E402

VARIANTS = {
    # bloom: regime enabled explicitly (opt-in since the A/B reversal
    # this harness's receipt decided; 128M covers the shape's 18M keys)
    "bloom": {"merge_bloom_max_keys": 128_000_000},
    # smj: regime off (the shipped default) -> ladder falls through to
    # the full-snapshot sort-merge anti join
    "smj": {"merge_bloom_max_keys": 0},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=44_000_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    print("pre-generating low-churn feed ...", file=sys.stderr)
    feed = pregenerate_low_churn_feed(args.events)

    out = {"events": args.events, "cores": args.cores, "variants": {}}
    for name, ing in VARIANTS.items():
        log_dir = f"/dev/shm/bloom_bytes_log_{name}"
        shutil.rmtree(log_dir, ignore_errors=True)
        print(f"replay: {name} ...", file=sys.stderr)
        r = run_replay(
            args.cores, feed, "cow", log_dir, ingest_conf=ing
        )
        logs = sorted(
            glob.glob(os.path.join(log_dir, "*")), key=os.path.getmtime
        )
        agg = parse_eventlog(logs[-1])
        out["variants"][name] = {
            "wall_s": round(r["wall"], 1),
            "task_cpu_s": round(agg["task_cpu"] / 1000, 1),
            "shuffle_bytes_written_mb": round(
                agg["shuffle_bytes_written"] / 1e6, 1
            ),
            "shuffle_bytes_read_mb": round(agg["shuffle_bytes_read"] / 1e6, 1),
            "input_bytes_mb": round(agg["input_bytes"] / 1e6, 1),
            "output_bytes_mb": round(agg["output_bytes"] / 1e6, 1),
            "spill_mb": round(
                (agg["mem_spilled"] + agg["disk_spilled"]) / 1e6, 1
            ),
            "n_tasks": agg["n_tasks"],
        }
        print(json.dumps({name: out["variants"][name]}), file=sys.stderr)

    b, s = out["variants"]["bloom"], out["variants"]["smj"]
    out["summary"] = {
        "shuffle_bytes_bloom_over_smj": round(
            (b["shuffle_bytes_written_mb"] or 1)
            / (s["shuffle_bytes_written_mb"] or 1),
            3,
        ),
        "input_bytes_bloom_over_smj": round(
            (b["input_bytes_mb"] or 1) / (s["input_bytes_mb"] or 1), 3
        ),
        "wall_bloom_over_smj": round(b["wall_s"] / s["wall_s"], 3),
    }
    print(json.dumps(out))
    with open(
        os.path.join(REPO, "bench", "profile_bloom_bytes.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
