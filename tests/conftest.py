from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import os

    # Workers unpickle classes defined in test modules (the MapReduce
    # facade ships user classes to executors) — they need repo + tests
    # on their import path.
    os.environ["PYTHONPATH"] = (
        f"{REPO_ROOT}:{REPO_ROOT / 'tests'}:" + os.environ.get("PYTHONPATH", "")
    )
    import tempfile

    from corral_spark.session import build_session

    warehouse = tempfile.mkdtemp(prefix="corral-warehouse-")
    spark = build_session(
        "corral_spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for sf_dir in (SF_SMOKE, SF_CORRECT):
        pass  # views registered per-test via oracle_connection
    yield con
    con.close()
