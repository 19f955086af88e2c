"""Prove (or refute) the fixed-aggregate-host-budget hypothesis.

Observation that motivates this: interleaved 1→4 pinned scaling legs show
mor at ~110k events/s on local[1] and ~103-231k on local[4] — i.e. a
1-core leg often matches a 4-core leg's AGGREGATE. Two hypotheses:
  (a) the engine fails to scale;
  (b) the host (burst-credit VM) delivers a fixed aggregate CPU budget, so
      a 1-core-pinned run gets full per-core speed while a 4-core run gets
      ~1/4 per core — and ANY multi-core measurement is capped by the
      budget, not the code.

This experiment separates them with zero engine involvement in the scaling
dimension: run K IDENTICAL, INDEPENDENT 1-core-pinned replays (separate
JVMs, separate table dirs, disjoint CPUs, same read-only feed)
CONCURRENTLY. There is no shared engine state — if the engine were the
bottleneck, K independent copies would still aggregate to ~K× a single
copy. Therefore:

    budget_ratio(K) = aggregate_throughput(K concurrent) / single ≈ K
        → per-core delivery is flat; scaling measurements reflect the code.
    budget_ratio(K) « K (→ ~1)
        → the host caps aggregate compute; N→4N measurements on this box
          are bounded by the cap, which a real cluster (per-node credits)
          does not share.

Singles bracket the concurrent legs (single, K=2, K=4, single) so host
drift is visible. mor-only (shortest leg). Writes bench/hostbudget.json.

Usage: python bench/hostbudget.py [--events 2000000] [--ks 2 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "bench"))

from scaling import pregenerate_feed  # noqa: E402


def _env(events: int, feed: str) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": "1",
            "BENCH_CDC_EVENTS": str(events),
            "BENCH_CDC_MODES": "mor",
            "BENCH_CDC_EPOCHS": "4",
            "BENCH_REPLAY_ONLY": "1",
            "BENCH_SKIP_EQUALITY": "1",
            "BENCH_FEED_DIR": feed,
            "SPARK_DRIVER_MEMORY": os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        }
    )
    return env


def _launch(cpu: int, events: int, feed: str) -> subprocess.Popen:
    def _pin():
        os.sched_setaffinity(0, {cpu})

    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=_env(events, feed), stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, preexec_fn=_pin,
    )


def _eps(stdout: str) -> float:
    # longest JSON line = bench.py's full record (a compact summary follows)
    line = max(
        (ln for ln in stdout.splitlines() if ln.startswith("{")), key=len
    )
    m = json.loads(line)["cdc_mor"]
    return m.get("sustained_events_per_sec") or m["events_per_sec"]


def run_group(k: int, events: int, feed: str) -> dict:
    t0 = time.time()
    procs = [_launch(cpu, events, feed) for cpu in range(k)]
    outs = [p.communicate()[0] for p in procs]
    wall = time.time() - t0
    for p in procs:
        if p.returncode != 0:
            raise RuntimeError(f"leg failed rc={p.returncode}")
    per_leg = [_eps(o) for o in outs]
    return {
        "k": k,
        "per_leg_sustained_eps": [round(x, 1) for x in per_leg],
        "aggregate_sustained_eps": round(sum(per_leg), 1),
        "group_wall_s": round(wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--ks", type=int, nargs="+", default=[2, 4])
    args = ap.parse_args()

    feed = pregenerate_feed(args.events)
    groups = [run_group(1, args.events, feed)]
    print(json.dumps(groups[-1]), file=sys.stderr)
    for k in args.ks:
        groups.append(run_group(k, args.events, feed))
        print(json.dumps(groups[-1]), file=sys.stderr)
    groups.append(run_group(1, args.events, feed))
    print(json.dumps(groups[-1]), file=sys.stderr)

    singles = [g["aggregate_sustained_eps"] for g in groups if g["k"] == 1]
    single = sum(singles) / len(singles)
    ratios = {
        str(g["k"]): round(g["aggregate_sustained_eps"] / single, 3)
        for g in groups
        if g["k"] > 1
    }
    result = {
        "experiment": "K independent 1-core-pinned mor replays, concurrent",
        "events_per_leg": args.events,
        "single_sustained_eps_mean": round(single, 1),
        "single_brackets": singles,
        "groups": groups,
        "budget_ratio": ratios,
        "reading": "ratio≈K → per-core delivery flat (scaling numbers reflect the code); ratio≈1 → host caps aggregate compute (scaling numbers are host-bounded)",
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(os.path.join(REPO, "bench", "hostbudget.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
