from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import shutil

    from rq_spark.session import get_spark

    # a KILLED previous run (SIGKILL skips every finally) leaves its
    # managed-table dirs in the default warehouse; with a fresh
    # in-memory catalog EVERY surviving dir is an orphan, and the
    # engine's fail-loud orphan guards would (correctly) refuse to
    # write over them — purge before the session starts
    wh = os.path.join(REPO, "spark-warehouse")
    if os.path.isdir(wh):
        shutil.rmtree(wh)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("rq_spark_tests", cpus=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
