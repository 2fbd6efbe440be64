"""Shared pytest fixtures: one local SparkSession per test run, plus
small deterministic frames mirroring the reference's CSV fixtures
(FIXTURES.md §2: data_flat / data_missing / data_simple analogs).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from tstoolbox_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tstoolbox_spark_tests", parallelism=4, driver_memory="8g")
    yield s


def hourly(n, start="2011-01-01 00:00:00"):
    t0 = dt.datetime.fromisoformat(start)
    return [t0 + dt.timedelta(hours=i) for i in range(n)]


@pytest.fixture(scope="session")
def flat_pdf():
    """data_flat analog: 26 hourly rows, constant value 2."""
    return pd.DataFrame({"ts": hourly(26), "value": [2.0] * 26})


@pytest.fixture(scope="session")
def missing_pdf():
    """data_missing analog: hourly series with null cells AND missing
    rows (two gap regions)."""
    ts = hourly(26)
    vals = [float(i) if i % 7 else None for i in range(26)]
    pdf = pd.DataFrame({"ts": ts, "value": vals})
    # drop rows 10-12 entirely (gap as missing rows)
    return pdf.drop(index=[10, 11, 12]).reset_index(drop=True)


@pytest.fixture(scope="session")
def twocol_pdf():
    """multi-column daily frame with mixed magnitudes."""
    import numpy as np

    rng = np.random.RandomState(42)
    n = 200
    t0 = dt.datetime(2020, 1, 1)
    return pd.DataFrame(
        {
            "ts": [t0 + dt.timedelta(days=i) for i in range(n)],
            "a": rng.randn(n) * 100,
            "b": rng.rand(n),
        }
    )


def to_sdf(spark, pdf):
    return spark.createDataFrame(pdf)
