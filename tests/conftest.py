from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
# Python workers must be able to import module-level test helpers
# (cloudpickle serializes them by reference).
os.environ["PYTHONPATH"] = (
    "/root/repo:/root/repo/tests:" + os.environ.get("PYTHONPATH", "")
)

from distributed_mapreduce_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
