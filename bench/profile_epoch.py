"""Attribute CDC-replay wall time from Spark event logs at one core count.

Usage:  taskset -c 0-1 python bench/profile_epoch.py --cores 2 [--events 4000000]
        taskset -c 0-7 python bench/profile_epoch.py --cores 8

Runs the cow and mor replay on a pre-generated feed with
spark.eventLog.enabled, then folds the event log into a per-run summary:

  wall            total replay wall-clock
  task_runtime    sum of task executorRunTime (÷cores = perfectly-parallel wall)
  task_cpu        sum of executorCpuTime (runtime - cpu = stall/IO/contention)
  gc              sum of jvmGCTime
  shuffle_wait    fetch wait + write time
  ser/deser       task result + deserialization overheads
  sched_gap       wall not covered by any running stage (driver-serial time)

Comparing the same table at 2 vs 8 cores shows WHICH term fails to scale —
the measurement behind BENCH/BASELINE.md's scaling narrative.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_replay(
    cores: int,
    feed_dir: str,
    mode: str,
    log_dir: str,
    shuffle: int | None = None,
    normalizer: str = "arrow",
    topology: str = "threads",
    epochs: int = 2,
    conf: dict[str, str] | None = None,
    ingest_conf: dict | None = None,
) -> dict:
    from transcript_cdc.plans.ingest import CdcIngestJob, IngestConfig
    from transcript_cdc.session import get_spark

    os.makedirs(log_dir, exist_ok=True)
    if shuffle is None:
        shuffle = max(cores * 4, 8)
    if topology == "executors":
        mem_mb = int(os.environ.get("SPARK_EXECUTOR_MEM_MB", "12288"))
        master = f"local-cluster[{cores},1,{mem_mb}]"
    else:
        master = f"local[{cores}]"
    spark = get_spark(
        f"profile-{mode}-{cores}",
        master=master,
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            **(conf or {}),
        },
    )
    work = f"/dev/shm/profile_{mode}_{cores}"
    shutil.rmtree(work, ignore_errors=True)
    n_events = sum(
        1 for _ in ()
    )  # placeholder; epoch sizing comes from the feed length below
    import pyarrow.parquet as pq

    n_events = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(feed_dir, "*.parquet"))
    )
    cfg_kw = dict(
        n_buckets=32,
        epoch_events=n_events // epochs + 1,
        write_partitions=shuffle,
        storage=mode,
        normalize=normalizer != "off",
        arrow_normalizer=normalizer == "arrow",
    )
    cfg_kw.update(ingest_conf or {})
    cfg = IngestConfig(**cfg_kw)
    job = CdcIngestJob(spark, feed_dir, os.path.join(work, "t"), cfg)
    t0 = time.time()
    job.run()
    wall = time.time() - t0
    app_id = spark.sparkContext.applicationId
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return {"wall": wall, "app_id": app_id, "events": n_events}


def parse_eventlog(path: str) -> dict:
    agg = {
        "task_runtime": 0.0, "task_cpu": 0.0, "gc": 0.0,
        "shuffle_wait": 0.0, "shuffle_write": 0.0,
        "deser": 0.0, "result_ser": 0.0, "n_tasks": 0,
        "mem_spilled": 0, "disk_spilled": 0,
        # byte counters: deterministic (host-weather-free) receipts for
        # codec/byte-reduction A/Bs — compressed shuffle bytes on the wire
        "shuffle_bytes_written": 0, "shuffle_bytes_read": 0,
        "input_bytes": 0, "output_bytes": 0,
    }
    # Spark 4 rolling logs: eventlog_v2_<appid>/events_*; classic: one file
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "events_*")))
    else:
        files = [path]

    def lines():
        for f in files:
            with open(f) as fh:
                yield from fh

    stage_spans = []
    jobs: list[dict] = []
    for line in lines():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerTaskEnd":
            m = ev.get("Task Metrics") or {}
            agg["n_tasks"] += 1
            agg["task_runtime"] += (ev.get("Task Info") or {}).get("Finish Time", 0) - (
                ev.get("Task Info") or {}
            ).get("Launch Time", 0)
            agg["task_cpu"] += m.get("Executor CPU Time", 0) / 1e6  # ns→ms
            agg["gc"] += m.get("JVM GC Time", 0)
            agg["shuffle_wait"] += (m.get("Shuffle Read Metrics") or {}).get(
                "Fetch Wait Time", 0
            )
            agg["shuffle_write"] += (m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Write Time", 0
            ) / 1e6
            agg["shuffle_bytes_written"] += (
                m.get("Shuffle Write Metrics") or {}
            ).get("Shuffle Bytes Written", 0)
            srm = m.get("Shuffle Read Metrics") or {}
            agg["shuffle_bytes_read"] += srm.get(
                "Local Bytes Read", 0
            ) + srm.get("Remote Bytes Read", 0)
            agg["input_bytes"] += (m.get("Input Metrics") or {}).get(
                "Bytes Read", 0
            )
            agg["output_bytes"] += (m.get("Output Metrics") or {}).get(
                "Bytes Written", 0
            )
            agg["deser"] += m.get("Executor Deserialize Time", 0)
            agg["result_ser"] += m.get("Result Serialization Time", 0)
            agg["mem_spilled"] += m.get("Memory Bytes Spilled", 0)
            agg["disk_spilled"] += m.get("Disk Bytes Spilled", 0)
        elif e == "SparkListenerJobStart":
            # stage name carries the RDD callsite ("collect at foo.py:123")
            # — more diagnostic than the job-group description
            jobs.append(
                {
                    "id": ev.get("Job ID"),
                    "start": ev.get("Submission Time"),
                    "desc": (ev.get("Stage Infos") or [{}])[-1].get(
                        "Stage Name", ""
                    )[:70],
                    "n_stages": len(ev.get("Stage Infos") or []),
                }
            )
        elif e == "SparkListenerJobEnd":
            for j in jobs:
                if j["id"] == ev.get("Job ID"):
                    j["end"] = ev.get("Completion Time")
        elif e == "SparkListenerStageCompleted":
            si = ev.get("Stage Info") or {}
            if si.get("Submission Time") and si.get("Completion Time"):
                stage_spans.append(
                    (si["Submission Time"], si["Completion Time"])
                )
    # driver-serial time = wall regions with no stage in flight
    stage_spans.sort()
    covered, cur_s, cur_e = 0, None, None
    for s, e in stage_spans:
        if cur_s is None:
            cur_s, cur_e = s, e
        elif s <= cur_e:
            cur_e = max(cur_e, e)
        else:
            covered += cur_e - cur_s
            cur_s, cur_e = s, e
    if cur_s is not None:
        covered += cur_e - cur_s
    agg["stage_covered"] = covered
    if stage_spans:
        agg["span"] = max(e for _, e in stage_spans) - min(s for s, _ in stage_spans)
    # per-job timeline with inter-job driver gaps
    jobs = [j for j in jobs if j.get("end")]
    jobs.sort(key=lambda j: j["start"])
    timeline = []
    prev_end = None
    for j in jobs:
        timeline.append(
            {
                "job": j["id"],
                "wall_s": round((j["end"] - j["start"]) / 1000, 2),
                "gap_before_s": (
                    None
                    if prev_end is None
                    else round((j["start"] - prev_end) / 1000, 2)
                ),
                "desc": j["desc"],
            }
        )
        prev_end = j["end"]
    agg["jobs"] = timeline
    return agg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--feed", default=None)
    ap.add_argument("--modes", default="cow,mor")
    ap.add_argument("--shuffle", type=int, default=None)
    ap.add_argument(
        "--normalizer", default="arrow", choices=["arrow", "sql", "off"]
    )
    ap.add_argument(
        "--topology", default="threads", choices=["threads", "executors"],
        help="threads=local[N]; executors=local-cluster[N,1,mem] — N "
             "single-core executor JVMs (the N→4N-executor shape)",
    )
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument(
        "--conf", action="append", default=[],
        help="extra Spark conf key=value (repeatable)",
    )
    args = ap.parse_args()
    conf = dict(kv.split("=", 1) for kv in args.conf)

    feed = args.feed
    if feed is None:
        feed = f"/dev/shm/profile_feed_{args.events}"
        if not os.path.isdir(feed):
            from transcript_cdc.datagen import StreamSpec, write_change_feed

            n_conv = max(100, int(args.events / (10 * 1.44)))
            write_change_feed(
                StreamSpec(
                    n_conversations=n_conv, avg_turns=10, update_ratio=0.35,
                    delete_ratio=0.08, absent_delete_ratio=0.01, zipf_s=1.2,
                    out_of_order_fraction=0.2, evolution_at=0.6, seed=42,
                    events_per_file=max(50_000, args.events // 16),
                ),
                feed,
            )

    log_dir = f"/dev/shm/eventlog_{args.cores}"
    shutil.rmtree(log_dir, ignore_errors=True)
    for mode in args.modes.split(","):
        r = run_replay(
            args.cores, feed, mode, log_dir,
            shuffle=args.shuffle, normalizer=args.normalizer,
            topology=args.topology, epochs=args.epochs, conf=conf,
        )
        logf = os.path.join(log_dir, r["app_id"])
        if not os.path.exists(logf):
            logf = os.path.join(log_dir, f"eventlog_v2_{r['app_id']}")
        agg = parse_eventlog(logf)
        wall_ms = r["wall"] * 1000
        out = {
            "mode": mode, "cores": args.cores, "events": r["events"],
            "shuffle": args.shuffle, "normalizer": args.normalizer,
            "topology": args.topology, "epochs": args.epochs,
            "wall_s": round(r["wall"], 2),
            "ev_per_s": round(r["events"] / r["wall"]),
            "task_runtime_s": round(agg["task_runtime"] / 1000, 1),
            "task_cpu_s": round(agg["task_cpu"] / 1000, 1),
            "stall_s": round((agg["task_runtime"] - agg["task_cpu"] - agg["gc"]) / 1000, 1),
            "gc_s": round(agg["gc"] / 1000, 1),
            "shuffle_wait_s": round(agg["shuffle_wait"] / 1000, 2),
            "shuffle_write_s": round(agg["shuffle_write"] / 1000, 2),
            "deser_s": round(agg["deser"] / 1000, 2),
            "sched_gap_s": round((wall_ms - agg.get("stage_covered", 0)) / 1000, 2),
            "shuffle_mb_written": round(agg["shuffle_bytes_written"] / 1e6, 1),
            "shuffle_mb_read": round(agg["shuffle_bytes_read"] / 1e6, 1),
            "input_mb": round(agg["input_bytes"] / 1e6, 1),
            "output_mb": round(agg["output_bytes"] / 1e6, 1),
            "spill_mb": round(agg["mem_spilled"] / 1e6),
            "spill_disk_mb": round(agg["disk_spilled"] / 1e6),
            "n_tasks": agg["n_tasks"],
            "runtime_per_core_s": round(agg["task_runtime"] / 1000 / args.cores, 1),
        }
        print(json.dumps(out))
        if os.environ.get("PROFILE_JOBS") == "1":
            for j in agg["jobs"]:
                print(f"  job {j['job']:>3}  gap {str(j['gap_before_s']):>6}  "
                      f"wall {j['wall_s']:>7.2f}  {j['desc']}", file=sys.stderr)


if __name__ == "__main__":
    main()
