from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from msgraphdatapipelines_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # 16g default (r8): the oracle gate alone is 65+ rows in one session,
    # several building ANN indexes with eager localCheckpoints — 8g left
    # no headroom late in a full run and a JVM death cascades across every
    # remaining test.  Explicit SPARK_GRAFT_DRIVER_MEM still wins.
    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    # r11 (r10 VERDICT item 5): 8 threads on the 32-core harness — the
    # suite is hundreds of tiny distributed jobs, and 4 threads left the
    # iterative operators (ANN builds, BFS rounds, streaming batches)
    # scheduler-bound.  Overridable for constrained hosts.
    s = get_spark("tests", cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
