from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from timeseriescorrelation_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        shuffle_partitions=8,
        app_name="tsc-tests",
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    """~20 convs / ~1k turns deterministic fixture (FIXTURES.md §1 tiny)."""
    from timeseriescorrelation_spark.synth import synth_transcripts

    df = synth_transcripts(spark, n_convs=20, base_turns=50, seed=42,
                           skew_frac=0.05, skew_min_mult=5, skew_max_mult=20)
    df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_series(spark, tiny_transcripts):
    from timeseriescorrelation_spark.operators.series import derive_series

    df = derive_series(tiny_transcripts)
    df.cache()
    df.count()
    return df
