import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from biomed_timeseries_preprocessing_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def small_transcripts(spark):
    """FIXTURES F1 t_small: 10 conversations, deterministic."""
    from biomed_timeseries_preprocessing_spark.sources.synth import synth_transcripts

    df = synth_transcripts(spark, 10)
    df.persist()
    df.count()
    return df
