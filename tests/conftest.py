from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from ollama_ocr_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app="ollama_ocr_spark-tests", master="local[8]",
                      shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def documents_smoke(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
