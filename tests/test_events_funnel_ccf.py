"""Ordered funnels, retention cohorts, and cross-correlation.

Funnel oracle: hand-built event logs exercising the strict-ordering
rule (same-timestamp events never chain, out-of-order steps don't
count). Retention oracle: pandas re-derivation of epoch-anchored
weekly cohorts. CCF oracle: numpy corrcoef on explicitly shifted
copies.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from tstoolbox_spark.operators.events import funnel_conversion, retention_cohorts
from tstoolbox_spark.operators.stats import cross_correlation


def _t(minute):
    return dt.datetime(2022, 5, 1, 0, minute)


def test_funnel_strict_ordering(spark):
    rows = [
        # u1: clean 3-step completion
        (1, _t(1), "view"), (1, _t(2), "click"), (1, _t(3), "purchase"),
        # u2: click at the SAME instant as view -> must not chain
        (2, _t(1), "view"), (2, _t(1), "click"), (2, _t(5), "purchase"),
        # u3: click BEFORE the first view -> step 2 never completes
        (3, _t(1), "click"), (3, _t(2), "view"), (3, _t(3), "purchase"),
        # u4: skips click entirely
        (4, _t(1), "view"), (4, _t(2), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["step"]: (r["step_name"], r["users"], r["conversion"])
        for r in funnel_conversion(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {
        1: ("view", 4, 1.0),
        2: ("click", 1, 0.25),
        3: ("purchase", 1, 1.0),
    }


def test_funnel_reuses_same_click_never(spark):
    # one click between view and purchase satisfies step 2; purchase
    # must be strictly AFTER that click
    rows = [(1, _t(1), "view"), (1, _t(2), "click"), (1, _t(2), "purchase")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["step"]: r["users"] for r in
           funnel_conversion(df, ["view", "click", "purchase"]).collect()}
    assert got == {1: 1, 2: 1, 3: 0}


def test_funnel_single_sort(spark):
    """Step k reads step k-1's window output, so Catalyst must stack
    one Window node per step — but they all share the same (user, ts)
    spec, so the data is shuffled and sorted exactly ONCE however many
    steps the funnel has."""
    rows = [(1, _t(1), "view"), (1, _t(2), "click"), (1, _t(3), "purchase")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    plan = (
        funnel_conversion(df, ["view", "click", "purchase"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Sort ") == 1
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def _retention_pandas(pdf, secs=604_800):
    p = (pdf["ts"].astype("int64") // 10**9 // secs) * secs
    act = pd.DataFrame({"u": pdf["user_id"], "p": p}).drop_duplicates()
    first = act.groupby("u")["p"].min().rename("cohort")
    j = act.join(first, on="u")
    j["offset"] = ((j["p"] - j["cohort"]) // secs).astype(int)
    out = (
        j.groupby(["cohort", "offset"])["u"].nunique().rename("users").reset_index()
    )
    out["cohort"] = pd.to_datetime(out["cohort"], unit="s")
    return out.sort_values(["cohort", "offset"]).reset_index(drop=True)


def test_retention_matches_pandas(spark):
    rng = np.random.default_rng(3)
    t0 = dt.datetime(2023, 1, 2)
    rows = []
    for u in range(40):
        start = int(rng.integers(0, 21))
        for d in sorted(rng.choice(60, size=rng.integers(1, 12), replace=False)):
            rows.append((u, t0 + dt.timedelta(days=start + int(d))))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    got = (
        retention_cohorts(spark.createDataFrame(pdf), "W")
        .toPandas()
        .sort_values(["cohort", "offset"])
        .reset_index(drop=True)
    )
    exp = _retention_pandas(pdf)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # offset-0 rows are the cohort sizes and dominate every later offset
    g0 = got[got["offset"] == 0].set_index("cohort")["users"]
    for _, r in got.iterrows():
        assert r["users"] <= g0[r["cohort"]]


def test_ccf_recovers_known_shift(spark):
    rng = np.random.default_rng(9)
    n = 400
    x = rng.normal(size=n)
    y = np.roll(x, 2) + rng.normal(scale=0.01, size=n)  # y_t ~ x_{t-2}
    t0 = dt.datetime(2024, 2, 1)
    df = spark.createDataFrame(
        [(t0 + dt.timedelta(hours=i), float(x[i]), float(y[i])) for i in range(n)],
        "ts timestamp, x double, y double",
    )
    lags = [0, 1, 2, 3, 4]
    got = {r["lag"]: r["ccf"] for r in cross_correlation(df, "x", "y", lags).collect()}
    assert max(got, key=got.get) == 2
    for k in lags:
        exp = np.corrcoef(x[: n - k], y[k:])[0, 1]
        assert abs(got[k] - exp) < 2e-6


def test_funnel_latency_and_exact_quantiles(spark):
    import datetime as dt
    import pandas as pd
    from pyspark.sql import functions as F
    from tstoolbox_spark.operators.events import funnel_latency
    from tstoolbox_spark.operators.stats import exact_quantiles

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1 converts in 2h; user 2 in 5h; user 3 never (wrong order)
    for u, offs in [(1, [("view", 0), ("click", 1), ("purchase", 2)]),
                    (2, [("view", 0), ("click", 4), ("purchase", 5)]),
                    (3, [("purchase", 0), ("click", 1), ("view", 2)])]:
        for ev, h in offs:
            rows.append((u, t0 + dt.timedelta(hours=h), ev))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    lat = funnel_latency(
        spark.createDataFrame(pdf), ["view", "click", "purchase"]
    )
    got = {r["user_id"]: r["latency_us"] for r in lat.collect()}
    hour = 3_600_000_000
    assert got == {1: 2 * hour, 2: 5 * hour}
    q = exact_quantiles(lat, "latency_us", qs=(0.5, 0.9)).collect()[0]
    # percentile_disc over [2h, 5h]: ceil(0.5*2)=1 -> 2h; ceil(0.9*2)=2 -> 5h
    assert q["n"] == 2 and q["p50"] == 2 * hour and q["p90"] == 5 * hour


def test_exact_quantiles_matches_hist_convention(spark):
    import datetime as dt
    import pandas as pd
    import numpy as np
    from tstoolbox_spark.operators.stats import exact_quantiles
    from tstoolbox_spark.pipeline.rollup import hist_base, hist_quantiles

    rng = np.random.RandomState(11)
    vals = rng.randint(1, 100, 500)
    t0 = dt.datetime(2024, 3, 1)
    pdf = pd.DataFrame(
        {"source": ["s"] * 500,
         "ts": [t0 + dt.timedelta(minutes=i) for i in range(500)],
         "n_tok": vals}
    )
    df = spark.createDataFrame(pdf)
    a = exact_quantiles(df, "n_tok", qs=(0.5, 0.9), key_cols=["source"]).collect()[0]
    b = hist_quantiles(hist_base(df, "1mo"), (0.5, 0.9)).collect()[0]
    assert (a["p50"], a["p90"]) == (b["p50"], b["p90"])


def test_interval_coverage_union_semantics(spark):
    import datetime as dt
    import pandas as pd
    from tstoolbox_spark.operators.events import interval_coverage

    t0 = dt.datetime(2024, 1, 1, 6, 0)
    mk = lambda m0, m1: (t0 + dt.timedelta(minutes=m0),  # noqa: E731
                         t0 + dt.timedelta(minutes=m1))
    rows = [mk(0, 10), mk(5, 15),    # overlap -> union 15 min
            mk(20, 30), mk(30, 40),  # touching -> merged 20 min
            mk(60, 70)]              # isolated 10 min
    pdf = pd.DataFrame(rows, columns=["start", "end"])
    out = interval_coverage(spark.createDataFrame(pdf), "start", "end").collect()
    assert len(out) == 1
    assert out[0]["covered_us"] == (15 + 20 + 10) * 60_000_000
