"""state_agg durations / run-length timelines, count-min sketch tiers,
and rolling-origin backtest folds — pandas-checked semantics plus the
sketch's upper-bound and composability invariants."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from tstoolbox_spark.operators.backtest import rolling_origin_folds
from tstoolbox_spark.operators.states import state_durations, state_runs
from tstoolbox_spark.pipeline.cms import (
    cms_estimate,
    cms_merge,
    cms_partials,
)


def _state_frame(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # key a: on(0h) on(1h) off(2h) on(5h) — last open
    for h, s in [(0, "on"), (1, "on"), (2, "off"), (5, "on")]:
        rows.append(("a", t0 + dt.timedelta(hours=h), s))
    # key b: single observation — zero duration
    rows.append(("b", t0 + dt.timedelta(hours=3), "idle"))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "state"])
    return spark.createDataFrame(pdf)


def test_state_durations_interval_semantics(spark):
    out = (
        state_durations(_state_frame(spark), "state", tier=None, key_cols=["k"])
        .orderBy("k", "state")
        .collect()
    )
    got = {(r["k"], r["state"]): (r["state_us"], r["n_obs"]) for r in out}
    hour = 3_600_000_000
    # a: on holds 0→1, 1→2, and 5→open(0); off holds 2→5
    assert got[("a", "on")] == (2 * hour, 3)
    assert got[("a", "off")] == (3 * hour, 1)
    # b: single observation, open interval
    assert got[("b", "idle")] == (0, 1)


def test_state_durations_tier_start_attribution(spark):
    t0 = dt.datetime(2024, 1, 1, 23, 0)
    pdf = pd.DataFrame(
        {
            "ts": [t0, t0 + dt.timedelta(hours=2)],
            "state": ["up", "down"],
        }
    )
    out = state_durations(
        spark.createDataFrame(pdf), "state", tier="1d"
    ).collect()
    got = {(r["ts"], r["state"]): r["state_us"] for r in out}
    # the 23:00→01:00 interval is attributed wholly to Jan 1 (start)
    assert got[(dt.datetime(2024, 1, 1), "up")] == 2 * 3_600_000_000
    assert got[(dt.datetime(2024, 1, 2), "down")] == 0


def test_state_runs_islands(spark):
    out = (
        state_runs(_state_frame(spark), "state", key_cols=["k"])
        .orderBy("k", "run_id")
        .collect()
    )
    a = [r for r in out if r["k"] == "a"]
    assert [(r["state"], r["n_obs"]) for r in a] == [
        ("on", 2),
        ("off", 1),
        ("on", 1),
    ]
    hour = 3_600_000_000
    # first 'on' run: starts 0h, ends at the off transition (2h)
    assert a[0]["run_us"] == 2 * hour
    # final run is open: run_end == run_start
    assert a[2]["run_us"] == 0
    b = [r for r in out if r["k"] == "b"]
    assert len(b) == 1 and b[0]["run_us"] == 0


def _events_frame(spark, n=400):
    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "ts": [t0 + dt.timedelta(minutes=13 * i) for i in range(n)],
            "user": [f"u{i % 37}" for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf)


def test_cms_upper_bound_and_exactness_when_sparse(spark):
    df = _events_frame(spark)
    grid = cms_partials(df, "user", tier=None)
    probes = df.select("user").distinct()
    est = {
        r["user"]: r["est"]
        for r in cms_estimate(grid, probes, "user").collect()
    }
    true = {
        r["user"]: r["n"]
        for r in df.groupBy("user")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(est) == set(true)
    for u, t in true.items():
        assert est[u] >= t  # CMS never undercounts
    # 37 keys into a 4x2048 grid: collisions are essentially absent
    assert sum(est[u] != true[u] for u in true) == 0


def test_cms_partials_compose(spark):
    df = _events_frame(spark)
    daily = cms_partials(df, "user", tier="1h")
    folded = cms_merge(daily, tier=None)
    direct = cms_partials(df, "user", tier=None)
    a = {(r["j"], r["bucket"]): r["cnt"] for r in folded.collect()}
    b = {(r["j"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert a == b


def test_cms_grid_is_bounded(spark):
    df = _events_frame(spark)
    grid = cms_partials(df, "user", tier=None, depth=3, width=64)
    assert grid.count() <= 3 * 64


def test_rolling_origin_fold_boundaries(spark):
    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {"ts": [t0 + dt.timedelta(hours=i) for i in range(100)],
         "v": list(range(100))}
    )
    df = spark.createDataFrame(pdf)
    out = rolling_origin_folds(df, n_folds=4).toPandas()
    # every fold's max train ts < min test ts (causality)
    for k in range(1, 5):
        f = out[out["fold"] == k]
        assert f[f["role"] == "train"]["ts"].max() < f[
            f["role"] == "test"
        ]["ts"].min()
    # train grows monotonically with the fold index
    sizes = [
        len(out[(out["fold"] == k) & (out["role"] == "train")])
        for k in range(1, 5)
    ]
    assert sizes == sorted(sizes) and sizes[0] > 0
    # the union of fold-k test windows tiles everything after b_1,
    # including the very last observation (half-open cover fix)
    tested = set(out[out["role"] == "test"]["v"])
    assert 99 in tested
    assert tested == set(range(min(tested), 100))


def test_hist_winsorized_mean_matches_numpy(spark):
    import numpy as np
    import datetime as dt
    from tstoolbox_spark.pipeline.rollup import hist_base, hist_winsorized_mean

    rng = np.random.RandomState(7)
    vals = rng.randint(1, 51, size=500)
    t0 = dt.datetime(2024, 3, 1)
    pdf = pd.DataFrame(
        {
            "source": ["s"] * 500,
            "ts": [t0 + dt.timedelta(minutes=i) for i in range(500)],
            "n_tok": vals,
        }
    )
    h = hist_base(spark.createDataFrame(pdf), "1d")
    out = hist_winsorized_mean(h, alpha=0.1).collect()
    assert len(out) == 1
    k = int(np.floor(0.1 * 500))
    s = np.sort(vals)
    s[:k] = s[k]
    s[500 - k:] = s[500 - k - 1]
    assert out[0]["winsorized_mean"] == round(float(s.mean()), 6)
    assert out[0]["n"] == 500


def test_hist_winsorized_alpha_guard(spark):
    import pytest as _pytest
    from tstoolbox_spark.pipeline.rollup import hist_winsorized_mean

    with _pytest.raises(ValueError):
        hist_winsorized_mean(None, alpha=0.5)


def test_canonical_pick_argmax_and_ties(spark):
    from tstoolbox_spark.textops.dedup import canonical_pick

    clusters = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a", "b", "c", "d", "e"],
                "cluster": ["a", "a", "a", "d", "d"],
                "keeper": [True, False, False, True, False],
            }
        )
    )
    scores = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a", "b", "c", "d", "e"],
                "n_chars": [10, 30, 30, 7, 7],
            }
        )
    )
    out = {
        r["cluster"]: (r["doc_id"], r["n_chars"], r["n_docs"])
        for r in canonical_pick(clusters, scores).collect()
    }
    # highest score wins; tie (b vs c at 30) breaks to smaller id
    assert out["a"] == ("b", 30.0, 3)
    assert out["d"] == ("d", 7.0, 2)


def test_drawdown_semantics(spark):
    from tstoolbox_spark.operators.window import drawdown

    t0 = dt.datetime(2024, 1, 1)
    vals = [10.0, 12.0, 8.0, 12.0, 15.0, 9.0]
    pdf = pd.DataFrame(
        {"ts": [t0 + dt.timedelta(hours=i) for i in range(6)], "v": vals}
    )
    out = (
        drawdown(spark.createDataFrame(pdf), "v")
        .orderBy("ts")
        .toPandas()
    )
    assert list(out["peak"]) == [10, 12, 12, 12, 15, 15]
    assert list(out["drawdown"]) == [0, 0, -4, 0, 0, -6]
    assert round(out["drawdown_pct"][2], 6) == round(-4 / 12, 6)


def test_weighted_mean_matches_numpy(spark):
    import numpy as np
    from tstoolbox_spark.operators.aggregate import weighted_mean

    rng = np.random.RandomState(3)
    n = 300
    t0 = dt.datetime(2024, 5, 1)
    pdf = pd.DataFrame(
        {
            "ts": [t0 + dt.timedelta(minutes=7 * i) for i in range(n)],
            "price": np.round(rng.uniform(1, 100, n), 2),
            "qty": rng.randint(1, 50, n),
        }
    )
    out = weighted_mean(
        spark.createDataFrame(pdf), "price", "qty", tier="1d"
    ).orderBy("ts").collect()
    g = pdf.groupby(pdf["ts"].dt.floor("D"))
    for row, (_, grp) in zip(out, g):
        expect = float((grp["price"] * grp["qty"]).sum() / grp["qty"].sum())
        assert abs(row["weighted_mean"] - expect) < 1e-9
        assert row["weight_sum"] == float(grp["qty"].sum())


def test_quantile_normalize_is_normalish(spark):
    import numpy as np
    from tstoolbox_spark.operators.transform import quantile_normalize

    rng = np.random.RandomState(5)
    n = 1000
    t0 = dt.datetime(2024, 1, 1)
    # heavily skewed input: lognormal
    pdf = pd.DataFrame(
        {
            "ts": [t0 + dt.timedelta(minutes=i) for i in range(n)],
            "value": rng.lognormal(0, 2, n),
        }
    )
    res = quantile_normalize(
        spark.createDataFrame(pdf), value_cols=["value"]
    ).toPandas()
    out = res["value_qnorm"]
    # output is standard-normal by construction of the transform
    assert abs(out.mean()) < 0.01
    assert abs(out.std() - 1.0) < 0.05
    # strictly monotone in the input (pair columns from the SAME frame
    # — Spark output row order is arbitrary)
    m = res.sort_values("value")
    assert m["value_qnorm"].is_monotonic_increasing


def test_bloom_no_false_negatives_and_composes(spark):
    from tstoolbox_spark.pipeline.bloom import (
        bloom_build,
        bloom_merge,
        bloom_probe,
    )
    from pyspark.sql import functions as F

    ids = spark.range(500).select(
        F.concat(F.lit("id"), F.col("id")).alias("k")
    )
    bf = bloom_build(ids, "k")
    assert bf.count() <= 1024
    # every mask is a positive BIGINT (63-bit words — DuckDB-portable)
    assert bf.filter(F.col("mask") <= 0).count() == 0
    # members always read true
    assert bloom_probe(bf, ids, "k").filter("NOT maybe_member").count() == 0
    # absent ids mostly read false (fp < 3% at this load)
    absent = spark.range(500).select(
        F.concat(F.lit("nope"), F.col("id")).alias("k")
    )
    fp = bloom_probe(bf, absent, "k").filter("maybe_member").count()
    assert fp <= 15
    # split-build merge == whole build
    h1 = bloom_build(ids.filter("k < 'id25'"), "k")
    h2 = bloom_build(ids.filter("k >= 'id25'"), "k")
    m = {r["word"]: r["mask"] for r in bloom_merge(h1.unionByName(h2)).collect()}
    whole = {r["word"]: r["mask"] for r in bf.collect()}
    assert m == whole


def test_hist_cdf_reads(spark):
    from tstoolbox_spark.pipeline.rollup import hist_base, hist_cdf

    t0 = dt.datetime(2024, 3, 1)
    vals = [1, 1, 2, 5, 5, 5, 9, 10]
    pdf = pd.DataFrame(
        {
            "source": ["s"] * 8,
            "ts": [t0 + dt.timedelta(minutes=i) for i in range(8)],
            "n_tok": vals,
        }
    )
    h = hist_base(spark.createDataFrame(pdf), "1d")
    out = hist_cdf(h, (1, 5, 10)).collect()[0]
    assert out["n"] == 8
    assert out["le_1"] == 2 / 8
    assert out["le_5"] == 6 / 8
    assert out["le_10"] == 1.0


def test_staleness_report(spark):
    from tstoolbox_spark.operators.counters import staleness_report

    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "source": ["a", "a", "b", "c"],
            "ts": [t0, t0 + dt.timedelta(hours=5),
                   t0 + dt.timedelta(hours=3), t0 + dt.timedelta(hours=4,
                                                                 minutes=30)],
        }
    )
    out = {
        r["source"]: r
        for r in staleness_report(
            spark.createDataFrame(pdf), key_cols=["source"],
            threshold="1 hour",
        ).collect()
    }
    assert out["a"]["lag_us"] == 0 and not out["a"]["stale"]
    assert out["b"]["lag_us"] == 2 * 3_600_000_000 and out["b"]["stale"]
    # 30 min behind: within the 1 h threshold
    assert not out["c"]["stale"]


def test_zipf_alpha_recovers_exponent(spark):
    from tstoolbox_spark.textops.quality import zipf_alpha

    # synthesize a corpus whose word frequencies follow freq ∝ 1/rank
    words_ = []
    for r in range(1, 60):
        words_ += [f"w{r:03d}"] * max(1, int(round(600 / r)))
    pdf = pd.DataFrame({"text": [" ".join(words_)]})
    out = zipf_alpha(spark.createDataFrame(pdf), top_k=50).collect()[0]
    assert out["n_ranks"] == 50
    # rounding of 600/r makes this approximate; alpha ~ 1
    assert 0.9 < out["zipf_alpha"] < 1.1


def test_null_profile_counts(spark):
    from tstoolbox_spark.operators.core import null_profile

    pdf = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"] * 2,
            "x": [1.0, None, 3.0, None, 5.0, None],
            "y": [None] * 4 + [1.0, 2.0],
        }
    )
    out = {
        (r["k"], r["column"]): (r["n_null"], r["n"], r["null_frac"])
        for r in null_profile(
            spark.createDataFrame(pdf), key_cols=["k"]
        ).collect()
    }
    assert out[("a", "x")] == (2, 4, 0.5)
    assert out[("a", "y")] == (4, 4, 1.0)
    assert out[("b", "y")] == (0, 2, 0.0)


def test_benford_digits_on_benford_data(spark):
    import numpy as np
    from tstoolbox_spark.operators.drift import benford_digits

    # exponential growth is Benford-distributed
    vals = 1.07 ** np.arange(1, 1200)
    pdf = pd.DataFrame({"v": vals})
    out = benford_digits(spark.createDataFrame(pdf), "v").collect()
    assert {r["digit"] for r in out} == set(range(1, 10))
    chi2 = out[0]["chi2"]
    assert all(r["chi2"] == chi2 for r in out)
    # 8 dof, conforming data: chi2 comfortably under 20
    assert chi2 < 20.0, chi2
    # counts sum to n; expected counts sum to ~n
    n = out[0]["n"]
    assert sum(r["obs"] for r in out) == n
    assert abs(sum(r["exp"] for r in out) - n) < 0.01


def test_iqr_fences_counts(spark):
    from tstoolbox_spark.pipeline.rollup import hist_base, iqr_fences

    t0 = dt.datetime(2024, 3, 1)
    vals = [10] * 20 + [12] * 20 + [14] * 20 + [1, 50]  # two outliers
    pdf = pd.DataFrame(
        {
            "source": ["s"] * len(vals),
            "ts": [t0 + dt.timedelta(minutes=i) for i in range(len(vals))],
            "n_tok": vals,
        }
    )
    h = hist_base(spark.createDataFrame(pdf), "1d")
    out = iqr_fences(h, k=1.5).collect()[0]
    assert out["q1"] == 10 and out["q3"] == 14
    assert out["lo_fence"] == 10 - 1.5 * 4 and out["hi_fence"] == 14 + 1.5 * 4
    assert out["n_outliers"] == 2 and out["n"] == 62


def test_pearson_matrix_known_correlations(spark):
    import numpy as np
    from tstoolbox_spark.operators.stats import pearson_matrix

    t0 = dt.datetime(2024, 1, 1)
    n = 200
    x = np.linspace(0, 10, n)
    frames = []
    for key, series in [("up", x), ("down", -2 * x + 5), ("noise",
                        np.sin(37.0 * np.arange(n)))]:
        frames.append(pd.DataFrame({
            "k": key,
            "ts": [t0 + dt.timedelta(hours=i) for i in range(n)],
            "v": series,
        }))
    df = spark.createDataFrame(pd.concat(frames))
    out = {(r["key_a"], r["key_b"]): r["r"]
           for r in pearson_matrix(df, "k", "v").collect()}
    assert out[("down", "up")] == -1.0
    assert abs(out[("noise", "up")]) < 0.2
    assert len(out) == 3  # 3 pairs from 3 keys


def test_state_runs_null_state_is_its_own_run(spark):
    from tstoolbox_spark.operators.states import state_runs

    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "ts": [t0 + dt.timedelta(hours=h) for h in range(4)],
            "state": ["A", None, "A", "A"],
        }
    )
    out = (
        state_runs(spark.createDataFrame(pdf), "state")
        .orderBy("run_id")
        .collect()
    )
    # A | NULL | A,A — three runs; the NULL observation never merges
    # into its neighbours (code-review finding)
    assert [(r["state"], r["n_obs"]) for r in out] == [
        ("A", 1), (None, 1), ("A", 2)
    ]
    # NULL-leading key: a single NULL run, opened by the first row
    pdf2 = pd.DataFrame(
        {"ts": [t0, t0 + dt.timedelta(hours=1)], "state": [None, None]}
    )
    out2 = state_runs(spark.createDataFrame(pdf2), "state").collect()
    assert len(out2) == 1 and out2[0]["n_obs"] == 2


def test_benford_includes_zero_observed_digits(spark):
    from tstoolbox_spark.operators.drift import benford_digits

    # every value starts with digit 1 — the most non-conforming case
    pdf = pd.DataFrame({"v": [1.5, 10.2, 199.0, 1.01] * 50})
    out = benford_digits(spark.createDataFrame(pdf), "v").collect()
    assert {r["digit"] for r in out} == set(range(1, 10))
    zeros = [r for r in out if r["digit"] > 1]
    assert all(r["obs"] == 0 for r in zeros)
    # chi2 must carry the zero-obs digits' expected mass:
    # sum over d>=2 of n*log10(1+1/d) + (n - n*log10(2))^2/(n*log10(2))
    import math
    n = 200
    exp1 = n * math.log10(2)
    expect = (n - exp1) ** 2 / exp1 + sum(
        n * math.log10(1 + 1 / d) for d in range(2, 10)
    )
    assert abs(out[0]["chi2"] - expect) < 0.01, (out[0]["chi2"], expect)


def test_weighted_mean_small_values_survive(spark):
    from tstoolbox_spark.operators.aggregate import weighted_mean

    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "ts": [t0 + dt.timedelta(minutes=i) for i in range(10)],
            "rate": [0.001] * 10,
            "w": [1] * 10,
        }
    )
    out = weighted_mean(
        spark.createDataFrame(pdf), "rate", "w", tier="1d"
    ).collect()[0]
    # 1e-6 quantum keeps 3-decimal products exact (code-review finding:
    # the old 2-decimal quantum zeroed them)
    assert out["weighted_mean"] == 0.001


def test_pearson_matrix_check_unique_guard(spark):
    import pytest as _pytest
    from tstoolbox_spark.operators.stats import pearson_matrix

    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "ts": [t0, t0, t0],
            "v": [1.0, 2.0, 3.0],
        }
    )
    df = spark.createDataFrame(pdf)
    with _pytest.raises(ValueError, match="duplicate"):
        pearson_matrix(df, "k", "v", check_unique=True)
