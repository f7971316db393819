from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from lsh_spark import synth  # noqa: E402
from lsh_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lsh_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def t1_transcripts(spark):
    return spark.read.parquet(synth.generate_tier("t1"))


@pytest.fixture(scope="session")
def t1_labels(spark):
    synth.generate_tier("t1")
    return spark.read.parquet(synth.dup_labels_path("t1"))
