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


# --------------------------------------------------------------------------
# Portable HLL (sparse register relation, engine-reproducible)
# --------------------------------------------------------------------------

from tstoolbox_spark.pipeline.hll import (  # noqa: E402
    PHLL_M,
    phll_cascade,
    phll_estimate,
    phll_partial,
)


def test_phll_cascade_registers_exactly_equal_direct(spark):
    """Register-wise MAX is associative + idempotent, so hour→day
    cascade must equal sketching the day directly REGISTER-FOR-
    REGISTER (not just within error — this is the exact contract the
    DuckDB oracle certifies)."""
    df = spark.createDataFrame(_events()).repartition(7)
    direct = phll_partial(df, "1d").orderBy("source", "ts", "idx")
    via_hour = phll_cascade(phll_partial(df, "1h"), "1d").orderBy(
        "source", "ts", "idx"
    )
    assert direct.exceptAll(via_hour).count() == 0
    assert via_hour.exceptAll(direct).count() == 0


def test_phll_estimate_within_error(spark):
    """m=256 → RSE ≈ 6.5%; allow 3σ plus linear-counting slack."""
    pdf = _events()
    df = spark.createDataFrame(pdf)
    est = phll_estimate(phll_cascade(phll_partial(df, "1h"), "1d")).toPandas()
    exact = (
        pdf.assign(day=pdf.ts.dt.floor("D"))
        .groupby(["source", "day"])["user_id"]
        .nunique()
    )
    for r in est.itertuples():
        true = exact[(r.source, pd.Timestamp(r.ts))]
        assert abs(r.approx_distinct - true) / true < 0.20, (
            r.source, r.ts, r.approx_distinct, true,
        )


def test_phll_partition_independent_and_null_safe(spark):
    """Registers are a pure function of the value set: shuffling the
    layout or injecting null ids must not change a single row."""
    pdf = _events(seed=5, n=5_000)
    pdf.loc[::50, "user_id"] = None
    a = phll_partial(spark.createDataFrame(pdf).coalesce(1), "1d")
    b = phll_partial(spark.createDataFrame(pdf).repartition(13), "1d")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # bounded state: at most m register rows per (source, day)
    top = (
        a.groupBy("source", "ts").count().agg(F.max("count")).collect()[0][0]
    )
    assert top <= PHLL_M


def test_phll_rho_ladder_matches_numpy(spark):
    """The 5-step shift ladder must equal a reference leading-zero
    rho on the same 60-bit md5 hashes."""
    import hashlib

    vals = list(range(200))
    pdf = pd.DataFrame(
        {
            "source": "a",
            "ts": [dt.datetime(2024, 3, 1)] * len(vals),
            "user_id": vals,
        }
    )
    out = phll_partial(spark.createDataFrame(pdf), "1d").collect()
    got = {(r.idx): r.rho for r in out}
    expect = {}
    for v in vals:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        idx = h % PHLL_M
        w = (h >> 8) & 0xFFFFFFFF
        rho = 33 - w.bit_length()
        expect[idx] = max(expect.get(idx, 0), rho)
    assert got == expect


def test_phll_partial_agg_in_plan(spark):
    """Register MAX combines map-side; one shuffle for the partial."""
    df = spark.createDataFrame(_events(n=2_000))
    plan = (
        phll_partial(df, "1h")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max" in plan
    assert plan.count("Exchange") == 1


def test_phll_running_union_equals_prefix_sketch(spark):
    """The cumulative register at bucket T must equal the sketch
    built directly from all raw rows with ts <= T — register for
    register (prefix-union losslessness)."""
    from tstoolbox_spark.pipeline.hll import phll_running_union

    pdf = _events(seed=9, n=8_000)
    df = spark.createDataFrame(pdf)
    daily = phll_partial(df, "1d", key_cols=("source",))
    cum = phll_running_union(daily, key_cols=("source",))
    days = sorted(pdf.ts.dt.floor("D").unique())
    probe = pd.Timestamp(days[1])
    prefix = pdf[pdf.ts.dt.floor("D") <= probe].assign(
        ts=pd.Timestamp(days[0])  # collapse to one bucket
    )
    direct = phll_partial(
        spark.createDataFrame(prefix), "1d", key_cols=("source",)
    ).drop("ts")
    got = cum.filter(F.col("ts") == probe).drop("ts")
    assert got.exceptAll(direct).count() == 0
    assert direct.exceptAll(got).count() == 0


def test_phll_overlap_within_error_of_exact(spark):
    """Inclusion-exclusion intersection estimate lands within the
    combined sketch error of the true overlap."""
    from tstoolbox_spark.pipeline.hll import (
        phll_overlap,
        phll_register_rows,
    )

    rng = np.random.default_rng(11)
    a_ids = set(range(0, 2_000))
    b_ids = set(range(1_200, 3_200))  # overlap = 800
    t0 = dt.datetime(2024, 3, 1)

    def frame(ids):
        return spark.createDataFrame(
            pd.DataFrame({"user_id": sorted(ids), "ts": t0})
        )

    def reg(ids):
        rows = phll_register_rows(frame(ids), "user_id")
        return (
            rows.groupBy("idx")
            .agg(F.max("rho").alias("rho"))
            .withColumn("ts", F.lit(t0))
        )

    out = phll_overlap(reg(a_ids), reg(b_ids), key_cols=()).collect()[0]
    true = len(a_ids & b_ids)
    # intersection error compounds ~3 sketch errors; allow a wide band
    assert abs(out["est_intersection"] - true) < 0.5 * true + 200
    assert abs(out["est_union"] - len(a_ids | b_ids)) / len(a_ids | b_ids) < 0.2
