"""HLL distinct-count tiers: cascade-vs-direct equality and accuracy.

The merge invariant under test is the HLL contract itself: unioning
hour sketches must give the SAME registers (hence the same estimate)
as sketching the day's raw rows directly — that is what makes the
partial safe to materialize and re-union for late data.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tstoolbox_spark.pipeline.hll import hll_base, hll_cascade, hll_estimate


def _events(seed=2, n=20_000, users=3_000):
    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2024, 3, 1)
    return pd.DataFrame(
        {
            "source": rng.choice(["a", "b"], n),
            "ts": [
                t0 + dt.timedelta(seconds=int(s))
                for s in rng.integers(0, 3 * 86_400, n)
            ],
            "user_id": rng.integers(0, users, n),
        }
    )


def test_cascade_estimate_matches_direct_within_error(spark):
    """Unioning hour sketches answers like sketching the day raw —
    within estimation error (the union's HLL_8 composite estimator
    differs from the direct HLL_4 sketch by well under the sketch's
    own ~1.6% RSE; see module docstring)."""
    df = spark.createDataFrame(_events())
    hours = hll_base(df, "1h", value_col="user_id")
    g = (
        hll_estimate(hll_cascade(hours, "1d")).toPandas()
        .sort_values(["source", "ts"]).reset_index(drop=True)
    )
    e = (
        hll_estimate(hll_base(df, "1d", value_col="user_id")).toPandas()
        .sort_values(["source", "ts"]).reset_index(drop=True)
    )
    assert (g[["source", "ts"]] == e[["source", "ts"]]).all().all()
    rel = (g["approx_distinct"] - e["approx_distinct"]).abs() / e["approx_distinct"]
    assert rel.max() < 0.02, rel.max()


def test_estimate_within_hll_error(spark):
    pdf = _events()
    df = spark.createDataFrame(pdf)
    got = {
        (r["source"], pd.Timestamp(r["ts"])): r["approx_distinct"]
        for r in hll_estimate(hll_base(df, "1d")).collect()
    }
    exact = pdf.groupby(
        ["source", pdf["ts"].dt.floor("D")]
    )["user_id"].nunique()
    assert set(got) == set(exact.index)
    for k, e in exact.items():
        # lg_k=12 → RSE ~1.04/sqrt(4096) ≈ 1.6%; allow 5 sigma
        assert abs(got[k] - e) / e < 0.08, (k, got[k], e)


def test_union_idempotent_for_late_partials(spark):
    """Re-unioning an already-included hour (late-batch replay) must
    not move the estimate — idempotence is what makes the refresh
    path (pipeline/incremental.py) safe for sketch columns."""
    df = spark.createDataFrame(_events(n=5_000))
    hours = hll_base(df, "1h")
    doubled = hours.unionAll(hours.limit(5))
    a = hll_estimate(hll_cascade(hours, "1d")).toPandas()
    b = hll_estimate(hll_cascade(doubled, "1d")).toPandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["source", "ts"]).reset_index(drop=True),
        b.sort_values(["source", "ts"]).reset_index(drop=True),
    )


def test_sketch_partial_agg_in_plan(spark):
    df = spark.createDataFrame(_events(n=2_000))
    plan = (
        hll_base(df, "1h")._jdf.queryExecution().executedPlan().toString()
    )
    # map-side combine of sketches before the single shuffle
    assert "partial_hll_sketch_agg" in plan
    assert plan.count("Exchange") == 1
