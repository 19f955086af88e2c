"""The spark-submit --py-files ship path (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

scripts/submit.sh zips transcript_cdc/ and ships it via --py-files to a
TRUE multi-JVM master (local-cluster[2,1,*]): the executor JVMs must
import the package from the shipped zip (NOT from the repo checkout — a
worker import bug in the zip layout would pass every in-process test and
still break a real cluster). The run's final table state is then checked
independently: DuckDB over exactly the files the newest manifest names,
against the dict replay oracle.

This is the only test that exercises the spark-submit entry
(scripts/run_ingest.py) and the zip packaging; everything else uses the
session factory's addPyFile self-ship.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess

import duckdb
import pytest

from transcript_cdc.datagen import (
    StreamSpec,
    generate_events,
    replay_oracle_fast,
    write_change_feed,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPEC = StreamSpec(n_conversations=120, seed=13, events_per_file=500)


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_submit_ship_path_runs_and_matches_oracle(tmp_path):
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "table")
    write_change_feed(SPEC, feed)

    env = dict(os.environ)
    # keep the shipped job's scratch off the throttled root disk
    env.setdefault("SPARK_GRAFT_TMPFS", "1")
    out = subprocess.run(
        [
            "bash",
            os.path.join(REPO, "scripts", "submit.sh"),
            "local-cluster[2,1,9216]",
            "2",
            feed,
            table,
            "cow",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    # run_ingest prints one JSON status line
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    status = json.loads(line)
    assert status["epochs_processed"] >= 1
    assert all(r.get("committed") for r in status["results"])

    # independent check: DuckDB over the newest manifest's files vs the
    # dict oracle (the engine never checks itself)
    mans = sorted(glob.glob(os.path.join(table, "_commits", "epoch=*.json")))
    assert mans
    m = json.load(open(mans[-1]))
    files = [os.path.join(table, f) for fl in m["buckets"].values() for f in fl]
    eng = (
        duckdb.connect()
        .execute(
            "SELECT conv_id, turn_idx, text FROM read_parquet(?, "
            "union_by_name=true) ORDER BY conv_id, turn_idx",
            [files],
        )
        .fetchall()
    )
    orc = replay_oracle_fast(generate_events(SPEC), normalize=True)
    want = [
        (c, int(t), x if x == x else None)
        for c, t, x in zip(orc["conv_id"], orc["turn_idx"], orc["text"])
    ]
    assert [(c, int(t), x) for c, t, x in eng] == want
