from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")  # sandbox: disk is ~8 MB/s

from transcript_cdc.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("transcript-cdc-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
