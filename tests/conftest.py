"""Shared Spark session for the test suite.

One session for the whole run (JVM start is ~15 s); small core/shuffle
counts keep tiny-DataFrame jobs from drowning in task overhead while
still exercising multi-partition execution paths.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from st_bigdata_consume_batch_ma_with_cr_ecd_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def rows_set(df):
    """Order-insensitive comparable form of a small DataFrame."""
    return {tuple(r) for r in df.collect()}
