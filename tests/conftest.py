from __future__ import annotations

import pytest

from mapping_analysis_spark.data.transcripts import ensure_transcripts
from mapping_analysis_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mapping-analysis-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_smoke(spark):
    """sf0.001 transcripts (~2k turns)."""
    return spark.read.parquet(ensure_transcripts("/root/testdata/sf0.001"))


@pytest.fixture(scope="session")
def transcripts_small(spark):
    """sf0.01 transcripts (~21k turns) — the correctness scale."""
    return spark.read.parquet(ensure_transcripts("/root/testdata/sf0.01"))
