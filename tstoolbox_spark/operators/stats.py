"""Statistics verbs: gof (goodness-of-fit), correlation, fdc
(flow-duration curve), remove_trend / add_trend / fit (linear).

Reference semantics:
- gof: /root/reference/tstoolbox/functions/gof.py:232-248 (16 stats;
  formula modules under tstoolbox/skill_metrics/) — every metric is a
  composition of avg/stddev/corr/sum over an aligned (obs, sim) pair,
  so the whole battery is ONE aggregate pass over the joined series.
- correlation: functions/correlation.py:125-176 (lags=0 → corr matrix;
  else autocorrelation at the given lags).
- calculate_fdc: functions/calculate_fdc.py:176-244 with plotting
  positions (alpha,beta) from tsutils.py:549-572.
- remove_trend: functions/remove_trend.py:111 (np.polyfit deg 1) —
  closed form via regr_slope/regr_intercept aggregates.
- fit linear: functions/fit.py:94-150.

All single-shuffle aggregates or window expressions; nothing leaves
the JVM.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .core import epoch_seconds

#: plotting-position (alpha, beta) pairs, tsutils.py:549-572
PLOTTING_POSITIONS = {
    "weibull": (0.0, 0.0),
    "benard": (0.3, 0.3),
    "filliben": (0.3175, 0.3175),
    "yu": (0.326, 0.326),
    "tukey": (1 / 3, 1 / 3),
    "blom": (0.375, 0.375),
    "cunnane": (0.4, 0.4),
    "gringorton": (0.44, 0.44),
    "hazen": (0.5, 0.5),
    "larsen": (0.567, 0.567),
    "gumbel": (1.0, 1.0),
}


def gof(
    df: DataFrame,
    obs_col: str,
    sim_col: str,
    key_cols: Sequence[str] = (),
    stats: Sequence[str] | None = None,
) -> DataFrame:
    """Goodness-of-fit battery between two aligned columns.

    Implemented metrics (names follow gof.py:232-248): bias, pc_bias,
    apc_bias, rmsd, crmsd, corrcoef, coefdet, murphyss, nse, kge09,
    kge12, index_agreement, mae, me(mean error == bias), stdev_obs,
    stdev_sim. One aggregate pass; every metric is algebraic in
    sums/moments so map-side partials apply.
    """
    o, s = F.col(obs_col), F.col(sim_col)
    d = s - o
    mean_o, mean_s = F.avg(o), F.avg(s)
    std_o, std_s = F.stddev_samp(o), F.stddev_samp(s)
    # population std for murphy/crmsd parity with skill_metrics (np.std ddof=0)
    pstd_o, pstd_s = F.stddev_pop(o), F.stddev_pop(s)
    cc = F.corr(o, s)
    rmsd = F.sqrt(F.avg(d * d))
    exprs: dict[str, Column] = {}
    exprs["bias"] = F.avg(d)
    exprs["pc_bias"] = 100.0 * F.sum(d) / F.sum(o)
    exprs["apc_bias"] = 100.0 * F.sum(F.abs(d)) / F.sum(o)
    exprs["rmsd"] = rmsd
    exprs["corrcoef"] = cc
    exprs["coefdet"] = cc * cc
    exprs["murphyss"] = 1 - (rmsd * rmsd) / (pstd_o * pstd_o)
    alpha09 = std_s / std_o
    alpha12 = (std_s / mean_s) / (std_o / mean_o)
    beta = mean_s / mean_o
    exprs["kge09"] = 1 - F.sqrt((cc - 1) ** 2 + (alpha09 - 1) ** 2 + (beta - 1) ** 2)
    exprs["kge12"] = 1 - F.sqrt((cc - 1) ** 2 + (alpha12 - 1) ** 2 + (beta - 1) ** 2)
    exprs["mae"] = F.avg(F.abs(d))
    # the reference's "Brier's Score" (gof.py:342) is literally
    # sum(pred - ref)**2 / n — the SQUARE OF THE SUM, not the Brier
    # mean-square — reproduced verbatim (it's the tested behavior,
    # tests/test_gof.py:28).
    exprs["brierss"] = (F.sum(d) ** 2) / F.count(F.lit(1))
    exprs["stdev_obs"] = std_o
    exprs["stdev_sim"] = std_s
    # nse / crmsd / index_agreement nest a global mean inside a
    # row-level term → computed in the two-pass helper.
    selected = list(stats) if stats else [
        "bias", "pc_bias", "apc_bias", "rmsd", "crmsd", "corrcoef", "coefdet",
        "murphyss", "nse", "kge09", "kge12", "index_agreement", "mae",
        "brierss", "stdev_obs", "stdev_sim",
    ]
    return _gof_two_pass(df, obs_col, sim_col, key_cols, exprs, selected)


def _gof_two_pass(df, obs_col, sim_col, key_cols, exprs, selected):
    """Metrics whose formula nests a global mean inside a row-level term
    (nse, crmsd, index_agreement) get the mean via a small aggregate
    broadcast-joined back (NOT a key window — one task per key at
    scale); the final reduction is still one aggregate."""
    o, s = F.col(obs_col), F.col(sim_col)
    keys = list(key_cols)
    means = df.groupBy(*keys).agg(F.avg(o).alias("__mo"), F.avg(s).alias("__ms"))
    pre = (
        df.join(F.broadcast(means), on=keys, how="left")
        if keys
        else df.crossJoin(F.broadcast(means))
    )
    mo, ms = F.col("__mo"), F.col("__ms")
    d = s - o
    agg: dict[str, Column] = dict(exprs)
    agg["nse"] = 1 - F.sum(d * d) / F.sum((o - mo) ** 2)
    agg["crmsd"] = F.sqrt(F.avg(((s - ms) - (o - mo)) ** 2))
    agg["index_agreement"] = 1 - F.sum(d * d) / F.sum(
        (F.abs(s - mo) + F.abs(o - mo)) ** 2
    )
    out_exprs = [agg[k].alias(k) for k in selected if k in agg]
    return pre.groupBy(*keys).agg(*out_exprs)


def autocorrelation(
    df: DataFrame,
    value_col: str,
    lags: Sequence[int],
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """ACF at the given lags. Ref: correlation.py:125-176.
    Lagged copies via one window sort, then one corr-aggregate pass."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    out = df
    for i in lags:
        out = out.withColumn(f"__lag{i}", F.lag(F.col(value_col), i).over(w))
    aggs = [F.corr(F.col(value_col), F.col(f"__lag{i}")).alias(f"acf_{i}") for i in lags]
    return out.groupBy(*key_cols).agg(*aggs)


def cross_correlation(
    df: DataFrame,
    x_col: str,
    y_col: str,
    lags: Sequence[int],
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """CCF: Pearson corr(x_t, y_{t+k}) at each lag k (engine
    extension of ``autocorrelation``, ref correlation.py:125-176 —
    same windowed-copies idiom, two series instead of one).

    One window sort materializes every lead copy of y, one aggregate
    pass computes all correlations, then an array explode unpivots to
    (keys, lag, ccf) rows — no per-lag job, no self-join.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    out = df
    for k in lags:
        out = out.withColumn(f"__lead{k}", F.lead(F.col(y_col), k).over(w))
    agg = out.groupBy(*key_cols).agg(
        *[
            F.corr(F.col(x_col), F.col(f"__lead{k}")).alias(f"__c{k}")
            for k in lags
        ]
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag"),
                    # engine-identical 6-dp rounding (see funnel note)
                    (
                        F.floor(F.col(f"__c{k}") * F.lit(1e6) + F.lit(0.5))
                        / F.lit(1e6)
                    ).alias("ccf"),
                )
                for k in lags
            ]
        )
    ).alias("r")
    return agg.select(*key_cols, rows).select(*key_cols, "r.lag", "r.ccf")


def dominant_period(
    df: DataFrame,
    value_col: str,
    max_lag: int = 48,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Dominant seasonality per key: the lag in 1..max_lag with the
    highest autocorrelation (engine extension; builds on
    ``autocorrelation``, ref correlation.py:125-176 — the reference
    stops at reporting the ACF, this picks the period).

    One window sort materializes all ``max_lag`` lagged copies, one
    aggregate pass computes every corr — no per-lag job. The argmax is
    an array reduction over the max_lag-wide row (ties break to the
    SMALLEST lag); corr is rounded to 6 decimals BEFORE ranking so the
    winner is stable across engines. Returns (keys, period_lag, acf).
    """
    lags = list(range(1, max_lag + 1))
    acf = autocorrelation(df, value_col, lags, ts_col, key_cols)
    arr = F.array(
        *[
            F.struct(
                F.round(F.col(f"acf_{i}"), 6).alias("acf"),
                F.lit(-i).alias("negk"),
            )
            for i in lags
        ]
    )
    best = F.array_max(F.filter(arr, lambda s: s["acf"].isNotNull()))
    return acf.select(
        *key_cols,
        (-best["negk"]).alias("period_lag"),
        best["acf"].alias("acf"),
    )


def theil_sen(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    x_unit_seconds: float = 3600.0,
    max_points: int = 20_000,
) -> DataFrame:
    """Theil–Sen robust trend per key: the median of all pairwise
    slopes (Theil 1950 / Sen 1968), with the median-residual intercept
    ``median(y - m*x)``. Engine extension (complements ``linear_fit``'s
    OLS trend with the 29%-breakdown robust estimator).

    Scale shape: the pair set is an equi-join on the key with an
    ``x_a < x_b`` filter — O(n²) rows PER KEY, so like
    ``correlation_kendall`` this targets aggregated tiers, not raw
    corpora; a guard refuses keys above ``max_points`` rows
    (20k rows → 2·10⁸ pairs/key, the practical single-key ceiling).
    ``x`` is the epoch time scaled by ``x_unit_seconds`` (default:
    slope per HOUR) so slopes stay in a rounding-friendly range.
    Both medians are exact percentiles over deterministic IEEE pair
    arithmetic, so results are engine-portable.
    """
    keys = list(key_cols)
    pts = df.select(
        *keys,
        (F.unix_timestamp(F.col(ts_col)) / F.lit(float(x_unit_seconds)))
        .cast("double")
        .alias("__x"),
        F.col(value_col).cast("double").alias("__y"),
    ).where(F.col("__y").isNotNull())
    counts = pts.groupBy(*keys).count() if keys else pts.groupBy(F.lit(1)).count()
    biggest = counts.agg(F.max("count")).collect()[0][0] or 0
    if biggest > max_points:
        raise ValueError(
            f"theil_sen: a key has {biggest} rows (> {max_points}); "
            "aggregate to a coarser tier first (O(n²) pairs per key)"
        )
    a = pts.select(*keys, F.col("__x").alias("xa"), F.col("__y").alias("ya"))
    b = pts.select(*keys, F.col("__x").alias("xb"), F.col("__y").alias("yb"))
    pairs = a.join(b, keys) if keys else a.crossJoin(b)
    slopes = pairs.where(F.col("xa") < F.col("xb")).select(
        *keys,
        ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias(
            "__m"
        ),
    )
    med_slope = slopes.groupBy(*keys).agg(
        F.percentile("__m", F.lit(0.5)).alias("slope")
    ) if keys else slopes.agg(F.percentile("__m", F.lit(0.5)).alias("slope"))
    joined = (
        pts.join(F.broadcast(med_slope), keys)
        if keys
        else pts.crossJoin(F.broadcast(med_slope))
    )
    out = joined.groupBy(*keys).agg(
        F.first("slope").alias("slope"),
        F.percentile(
            F.col("__y") - F.col("slope") * F.col("__x"), F.lit(0.5)
        ).alias("intercept"),
    ) if keys else joined.agg(
        F.first("slope").alias("slope"),
        F.percentile(
            F.col("__y") - F.col("slope") * F.col("__x"), F.lit(0.5)
        ).alias("intercept"),
    )
    return out


def correlation_matrix(
    df: DataFrame,
    value_cols: Sequence[str],
    key_cols: Sequence[str] = (),
    method: str = "pearson",
) -> DataFrame:
    """Pairwise correlation across columns; spearman = pearson of ranks."""
    keys = list(key_cols)
    src = df
    if method == "spearman":
        # average ranks via rank_components (parallel range-partitioned
        # row numbers + per-(key, value) min/max, joined back) — no
        # single-task per-key value sort.
        for c in value_cols:
            comps = rank_components(src, c, keys)
            avg_rank = ((F.col("__mn") + F.col("__mx")) / 2.0).alias(f"__rk_{c}")
            src = src.join(
                comps.select(*keys, c, avg_rank), [*keys, c], "left"
            )
        cols = [f"__rk_{c}" for c in value_cols]
    elif method == "pearson":
        cols = list(value_cols)
    else:
        raise ValueError(f"unsupported correlation method {method!r}")
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            name = f"corr_{value_cols[cols.index(a)]}_{value_cols[cols.index(b)]}"
            aggs.append(F.corr(F.col(a), F.col(b)).alias(name))
    return src.groupBy(*keys).agg(*aggs)


def correlation_kendall(
    df: DataFrame,
    value_cols: Sequence[str],
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Kendall tau-b matrix per key (ref correlation.py:125-176,
    method='kendall'). Concordance counting is O(n²) per series pair
    with no SQL closed form → grouped-map pandas (pandas .corr is the
    oracle itself, so parity is free); each key's series must fit one
    worker, which holds for per-entity panels, not raw corpora."""
    import pandas as pd

    keys = list(key_cols)
    pairs = [
        (a, b) for i, a in enumerate(value_cols) for b in value_cols[i + 1 :]
    ]
    out_cols = ", ".join(f"corr_{a}_{b} double" for a, b in pairs)
    key_schema = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys
    )
    schema = f"{key_schema}, {out_cols}" if keys else out_cols

    def _tau_b(x, y):
        # scipy-free tau-b: vectorized sign matrices over the pair grid
        import numpy as np

        m = ~(np.isnan(x) | np.isnan(y))
        x, y = x[m], y[m]
        n = len(x)
        if n < 2:
            return float("nan")
        if n > 20_000:
            # the sign matrix is O(n²) doubles (n=1e5 → ~40 GB/task);
            # kendall targets aggregated panels, not raw corpora.
            raise ValueError(
                f"correlation_kendall: series has {n} rows per key; "
                "aggregate to a coarser tier first (O(n²) pair grid)"
            )
        iu = np.triu_indices(n, 1)
        sx = np.sign(x[:, None] - x[None, :])[iu]
        sy = np.sign(y[:, None] - y[None, :])[iu]
        num = float((sx * sy).sum())
        n0 = n * (n - 1) / 2.0
        ties = lambda v: sum(  # noqa: E731
            c * (c - 1) / 2.0 for c in pd.Series(v).value_counts() if c > 1
        )
        d = (n0 - ties(x)) * (n0 - ties(y))
        return num / d**0.5 if d > 0 else float("nan")

    def _kendall(pdf: pd.DataFrame) -> pd.DataFrame:
        row = {k: [pdf[k].iloc[0]] for k in keys}
        for a, b in pairs:
            row[f"corr_{a}_{b}"] = [
                _tau_b(pdf[a].to_numpy(float), pdf[b].to_numpy(float))
            ]
        return pd.DataFrame(row)

    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__g"))
    out = grouped.applyInPandas(_kendall, schema=schema)
    return out


# Acklam's rational approximation to the inverse normal CDF
# (|relative error| < 1.15e-9; the classic public algorithm). Used for
# fdc's percent_point_function='norm'/'lognorm' — scipy is absent from
# this container, so the engine DEFINES its probit as Acklam's formula
# and mirrors the identical expression in the SQL oracle.
_ACKLAM_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
             1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_ACKLAM_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
             6.680131188771972e+01, -1.328068155288572e+01)
_ACKLAM_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
             -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_ACKLAM_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
             3.754408661907416e+00)
_ACKLAM_PLOW = 0.02425


def _horner(var: Column, coeffs, tail=None) -> Column:
    acc = F.lit(coeffs[0])
    for c in coeffs[1:]:
        acc = acc * var + F.lit(c)
    if tail is not None:
        acc = acc * var + F.lit(tail)
    return acc


def norm_ppf(p: Column) -> Column:
    """Inverse standard-normal CDF (Acklam) as a pure column expression
    — stays in whole-stage codegen, no UDF."""
    q_c = p - 0.5
    r_c = q_c * q_c
    central = (_horner(r_c, _ACKLAM_A) * q_c) / _horner(r_c, _ACKLAM_B, tail=1.0)
    q_l = F.sqrt(-2.0 * F.log(p))
    lower = _horner(q_l, _ACKLAM_C) / _horner(q_l, _ACKLAM_D, tail=1.0)
    q_u = F.sqrt(-2.0 * F.log(1.0 - p))
    upper = -_horner(q_u, _ACKLAM_C) / _horner(q_u, _ACKLAM_D, tail=1.0)
    return (
        F.when(p < _ACKLAM_PLOW, lower)
        .when(p <= 1.0 - _ACKLAM_PLOW, central)
        .otherwise(upper)
    )


def norm_ppf_sql(expr: str) -> str:
    """The byte-identical DuckDB twin of :func:`norm_ppf` (same Horner
    order, same literals) for oracle SQL generation."""
    def lit(c):
        # e-notation forces a DOUBLE literal in DuckDB (plain decimals
        # parse as DECIMAL and overflow scale under chained Horner
        # multiplication); 17 significant digits round-trips the float.
        return f"{c:.16e}"

    def horner(var, coeffs, tail=None):
        acc = lit(coeffs[0])
        for c in coeffs[1:]:
            acc = f"({acc}) * ({var}) + {lit(c)}"
        if tail is not None:
            acc = f"({acc}) * ({var}) + {lit(tail)}"
        return acc

    qc = f"(({expr}) - 5e-1)"
    rc = f"({qc} * {qc})"
    central = f"(({horner(rc, _ACKLAM_A)}) * {qc}) / ({horner(rc, _ACKLAM_B, 1.0)})"
    ql = f"(sqrt(-2e0 * ln({expr})))"
    lower = f"({horner(ql, _ACKLAM_C)}) / ({horner(ql, _ACKLAM_D, 1.0)})"
    qu = f"(sqrt(-2e0 * ln(1e0 - ({expr}))))"
    upper = f"(-({horner(qu, _ACKLAM_C)})) / ({horner(qu, _ACKLAM_D, 1.0)})"
    return (
        f"(CASE WHEN ({expr}) < {lit(_ACKLAM_PLOW)} THEN {lower} "
        f"WHEN ({expr}) <= 1e0 - {lit(_ACKLAM_PLOW)} THEN {central} "
        f"ELSE {upper} END)"
    )


def _apply_ppf(pos: Column, percent_point_function: str | None) -> Column:
    """tsutils.set_ppf (tsutils.py:523-541): transform plotting
    positions; non-None PPFs are reported ×100 like the reference's
    index (calculate_fdc.py:216-218)."""
    if percent_point_function is None:
        return pos
    if percent_point_function == "weibull":
        return F.log(-F.log(1.0 - pos)) * 100.0
    if percent_point_function == "norm":
        return norm_ppf(pos) * 100.0
    if percent_point_function == "lognorm":
        # lognorm.freeze(0.5, loc=0).ppf(y) = exp(0.5 * probit(y))
        return F.exp(0.5 * norm_ppf(pos)) * 100.0
    raise ValueError(
        f"percent_point_function must be None/norm/lognorm/weibull, "
        f"got {percent_point_function!r}"
    )


def fdc(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str] = (),
    plotting_position: str = "weibull",
    ascending: bool = True,
    percent_point_function: str | None = None,
) -> DataFrame:
    """Flow-duration curve: sorted values vs exceedance probability
    (i - a) / (n + 1 - a - b). Ref: calculate_fdc.py:176-244 +
    tsutils.py:549-572. Window rank per key, no collect."""
    a, b = PLOTTING_POSITIONS[plotting_position]
    keys = list(key_cols)
    v = F.col(value_col)
    order = v.asc() if ascending else v.desc()
    nn = df.filter(v.isNotNull())
    wv = Window.partitionBy(*keys).orderBy(order)
    wk = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    i = F.row_number().over(wv).cast("double")
    n = F.count(v).over(wk).cast("double")
    pos = (i - F.lit(a)) / (n + 1 - F.lit(a) - F.lit(b))
    return nn.select(
        *keys,
        _apply_ppf(pos, percent_point_function).alias("exceedance"),
        v.alias(value_col),
    )


def linear_fit(
    df: DataFrame,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    remove: bool = False,
) -> DataFrame:
    """Per-key OLS line on the epoch axis; append fitted values
    (``fit``) or residuals (``remove_trend``). Closed form via
    regr_slope/regr_intercept aggregates broadcast back over a key
    window — no MLlib, no Python. Ref: remove_trend.py:111, fit.py:94-150."""
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    keys = list(key_cols)
    x = epoch_seconds(F.col(ts_col))
    # per-key regression coefficients: map-side-combinable aggregate,
    # broadcast back (a key window would single-task each key at scale)
    aggs = []
    for c in value_cols:
        v = F.col(c).cast("double")
        aggs += [
            F.regr_slope(v, x).alias(f"__sl_{c}"),
            F.regr_intercept(v, x).alias(f"__ic_{c}"),
        ]
    coef = df.groupBy(*keys).agg(*aggs)
    out = (
        df.join(F.broadcast(coef), on=keys, how="left")
        if keys
        else df.crossJoin(F.broadcast(coef))
    )
    drop = []
    for c in value_cols:
        v = F.col(c).cast("double")
        line = F.col(f"__sl_{c}") * x + F.col(f"__ic_{c}")
        name = f"{c}_detrend" if remove else f"{c}_fit"
        out = out.withColumn(name, (v - line) if remove else line)
        drop += [f"__sl_{c}", f"__ic_{c}"]
    return out.drop(*drop)


def add_trend(
    df: DataFrame,
    start_offset: float,
    end_offset: float,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Linear ramp from start_offset at the first instant to end_offset
    at the last. Ref: add_trend.py:147-153."""
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    keys = list(key_cols)
    x = epoch_seconds(F.col(ts_col))
    extent = df.groupBy(*keys).agg(F.min(x).alias("__x0"), F.max(x).alias("__x1"))
    out = (
        df.join(F.broadcast(extent), on=keys, how="left")
        if keys
        else df.crossJoin(F.broadcast(extent))
    )
    ramp = F.lit(start_offset) + (x - F.col("__x0")) / (
        F.col("__x1") - F.col("__x0")
    ) * F.lit(end_offset - start_offset)
    for c in value_cols:
        out = out.withColumn(f"{c}_trend", ramp)
    return out.drop("__x0", "__x1")


def distributed_rank(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Parallel global row-number per key for LOW-cardinality keys.

    ``row_number() over (partition by key order by value)`` sorts each
    key in ONE task — a 20 TB key is a straggler. This ranks in
    parallel: rows bucket by per-key value-quantile boundaries
    (percentile_approx, computed once and PINNED on the driver as
    literals — GK summaries merge in shuffle-fetch order, so re-running
    the agg could disagree; pinning guarantees the counts job and the
    final join derive identical bucket ids); each (key, bucket) ranks
    locally via a
    window — parallel across buckets; the global rank adds the count
    of same-key rows in earlier buckets, a keys×buckets bookkeeping
    aggregate collected to the driver (metadata scale) and broadcast
    back. Non-numeric value columns fall back to range partitioning
    pinned with localCheckpoint.

    Ties: deterministic 'first' semantics given tiebreak_cols; include
    a unique column there for reproducible output. Rows tied on the
    value always share a bucket, so tie handling is unaffected by
    bucketing.
    """
    from pyspark.sql.types import NumericType

    spark = df.sparkSession
    keys = list(key_cols)
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if isinstance(df.schema[value_col].dataType, NumericType):
        qs = [i / n_parts for i in range(1, n_parts)]
        # Percentile_approx (Greenwald-Khanna) output depends on the
        # partial-aggregate merge order, which shuffle fetch timing makes
        # nondeterministic — so the boundaries are computed ONCE, pinned
        # on the driver (keys × n_parts doubles: metadata scale), and
        # rejoined as literals. Every downstream job then derives
        # identical bucket ids.
        # accuracy 1000 ≈ ±0.1% relative-rank error per boundary —
        # bucket sizes balanced within a few % (all that matters; rank
        # CORRECTNESS never depends on where the boundaries fall), at
        # ~half the GK merge cost of the old 10k setting (measured
        # 1.3-1.6 s → 0.6-0.8 s for the bounds job at 1M rows × 32
        # buckets).
        bound_rows = (
            df.groupBy(*keys)
            .agg(F.percentile_approx(F.col(value_col), qs, 1_000).alias("__bounds"))
            .collect()
        )
        b_schema = ", ".join(
            [f"{k} {df.schema[k].dataType.simpleString()}" for k in keys]
            + ["__bounds array<double>"]
        )
        bounds = spark.createDataFrame(
            [
                (*[r[k] for k in keys],
                 [float(b) for b in (r["__bounds"] or [])])
                for r in bound_rows
            ],
            b_schema,
        )
        joined = (
            df.join(F.broadcast(bounds), on=keys)
            if keys
            else df.crossJoin(F.broadcast(bounds))
        )
        # bucket id = #boundaries <= v: equal values always land in the
        # same bucket, and buckets respect value order by construction
        pid = F.size(
            F.filter(F.col("__bounds"), lambda b: b <= F.col(value_col))
        )
        with_pid = joined.withColumn("__pid", pid).drop("__bounds")
        # spread the local windows across the cluster on (keys, bucket);
        # persist so the counts job and the final ranked output share ONE
        # materialization of the shuffled frame (recompute-on-eviction
        # keeps it safe under executor loss, unlike localCheckpoint).
        with_pid = with_pid.repartition(n_parts, *keys, "__pid").persist()
    else:
        order_cols = [*keys, value_col, *tiebreak_cols]
        ranged = df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        # repartitionByRange samples boundaries at runtime → pin the
        # assignment so both jobs see identical partition ids.
        with_pid = ranged.withColumn(
            "__pid", F.spark_partition_id()
        ).localCheckpoint()
    counts = (
        with_pid.groupBy(*keys, "__pid").count().collect()
    )
    # offset(key, pid) = Σ count(key, p) for p < pid
    by_key: dict[tuple, list[tuple[int, int]]] = {}
    for r in counts:
        by_key.setdefault(tuple(r[k] for k in keys), []).append(
            (r["__pid"], r["count"])
        )
    rows = []
    for key, lst in by_key.items():
        acc = 0
        for pid, cnt in sorted(lst):
            rows.append((*key, pid, acc))
            acc += cnt
    off_schema = ", ".join(
        [f"{k} {df.schema[k].dataType.simpleString()}" for k in keys]
        + ["__pid int", "__offset long"]
    )
    offsets = spark.createDataFrame(rows, off_schema)
    local = Window.partitionBy(*keys, "__pid").orderBy(
        *[F.col(c) for c in [value_col, *tiebreak_cols]]
    )
    out = (
        with_pid.join(F.broadcast(offsets), [*keys, "__pid"])
        .withColumn(out_col, F.col("__offset") + F.row_number().over(local))
        .drop("__pid", "__offset")
    )
    return out


def fdc_scalable(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str] = (),
    plotting_position: str = "weibull",
    tiebreak_cols: Sequence[str] = (),
    percent_point_function: str | None = None,
) -> DataFrame:
    """fdc via distributed_rank — same output as ``fdc`` (given a
    deterministic tiebreak) with per-key parallelism instead of one
    task per key."""
    a, b = PLOTTING_POSITIONS[plotting_position]
    keys = list(key_cols)
    nn = df.filter(F.col(value_col).isNotNull())
    ranked = distributed_rank(nn, value_col, keys, tiebreak_cols, out_col="__i")
    totals = nn.groupBy(*keys).agg(F.count(value_col).alias("__n"))
    joined = (
        ranked.join(F.broadcast(totals), on=keys)
        if keys
        else ranked.crossJoin(F.broadcast(totals))
    )
    i, n = F.col("__i").cast("double"), F.col("__n").cast("double")
    pos = (i - F.lit(a)) / (n + 1 - F.lit(a) - F.lit(b))
    return joined.select(
        *keys,
        _apply_ppf(pos, percent_point_function).alias("exceedance"),
        F.col(value_col),
    )


def lowess_fit(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    frac: float = 0.01,
    iterations: int = 0,
    out_col: str | None = None,
) -> DataFrame:
    """LOWESS (Cleveland 1979): per-point tricube-weighted linear
    regression over the k = max(2, ceil(frac·n)) nearest neighbors.

    The reference's ``fit(method='lowess')`` delegates to statsmodels
    (fit.py:10,130-135 — statsmodels is not in this container); this is
    the same published algorithm, DEFINED declaratively: neighbors are
    rank-index based (the series is regular after regularize/aggregate,
    where rank distance == time distance), boundary windows shift
    leftward, and ``iterations`` bisquare-robustifies like lowess(it=).

    Scale shape: rn via one per-key sort, then explode(sequence(lo,hi))
    → equi-join → groupBy — every step shuffles on (key, rn), no range
    join, no UDF. Row inflation is ×k (k = frac·n), so this targets
    aggregated tiers (frac·n² total rows), like every whole-series verb
    here.
    """
    keys = list(key_cols)
    out_col = out_col or f"{value_col}_lowess"
    v = F.col(value_col)
    wv = Window.partitionBy(*keys).orderBy(ts_col)
    nn = df.filter(v.isNotNull())
    base = nn.withColumn("__i", F.row_number().over(wv) - 1)
    counts = nn.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    base = (
        base.join(F.broadcast(counts), on=keys)
        if keys
        else base.crossJoin(F.broadcast(counts))
    )
    k = F.greatest(F.lit(2), F.ceil(F.lit(float(frac)) * F.col("__n").cast("double")))
    base = base.withColumn("__k", F.least(k, F.col("__n")))
    lo = F.least(
        F.greatest(F.col("__i") - F.floor((F.col("__k") - 1) / 2), F.lit(0)),
        F.col("__n") - F.col("__k"),
    )
    base = base.withColumn("__lo", lo)

    series = base.select(
        *keys, F.col("__i").alias("__j"), v.alias("__yj")
    )
    fitted = None
    rob = None  # robustness weights from the previous iteration
    for _ in range(iterations + 1):
        nbrs = base.select(
            *keys, "__i", "__lo", "__k", v.alias("__yi"),
            F.explode(F.sequence(F.col("__lo"), F.col("__lo") + F.col("__k") - 1)).alias("__j"),
        ).join(series, [*keys, "__j"])
        if rob is not None:
            nbrs = nbrs.join(rob, [*keys, "__j"])
        d = F.abs(F.col("__j") - F.col("__i")).cast("double")
        maxd = F.greatest(
            F.col("__lo") + F.col("__k") - 1 - F.col("__i"),
            F.col("__i") - F.col("__lo"),
        ).cast("double")
        # maxd = 0 only for a single-row key (k clamps to n): weight 1
        # keeps the closed form defined and the fit returns the point.
        u = F.when(maxd > 0, d / maxd).otherwise(F.lit(0.0))
        w = (1.0 - u * u * u) ** 3
        if rob is not None:
            w = w * F.col("__rw")
        x = F.col("__j").cast("double")
        y = F.col("__yj")
        g = nbrs.groupBy(*keys, "__i").agg(
            F.sum(w).alias("sw"),
            F.sum(w * x).alias("sx"),
            F.sum(w * y).alias("sy"),
            F.sum(w * x * x).alias("sxx"),
            F.sum(w * x * y).alias("sxy"),
        )
        denom = F.col("sw") * F.col("sxx") - F.col("sx") * F.col("sx")
        slope = (F.col("sw") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
        intercept = (F.col("sy") - slope * F.col("sx")) / F.col("sw")
        yhat = F.when(
            F.abs(denom) > 1e-12,
            intercept + slope * F.col("__i").cast("double"),
        ).otherwise(F.col("sy") / F.col("sw"))
        fitted = g.select(*keys, "__i", yhat.alias("__fit"))
        if _ < iterations:
            resid = base.join(fitted, [*keys, "__i"]).select(
                *keys, F.col("__i").alias("__j"),
                (v - F.col("__fit")).alias("__r"),
            )
            med = resid.groupBy(*keys).agg(
                F.percentile(F.abs(F.col("__r")), F.lit(0.5)).alias("__m")
            )
            joined = (
                resid.join(F.broadcast(med), on=keys)
                if keys
                else resid.crossJoin(F.broadcast(med))
            )
            delta = F.least(
                F.greatest(F.col("__r") / (6.0 * F.col("__m")), F.lit(-1.0)),
                F.lit(1.0),
            )
            rob = joined.select(
                *keys, "__j",
                F.when(F.col("__m") > 0, (1.0 - delta * delta) ** 2)
                .otherwise(F.lit(1.0))
                .alias("__rw"),
            )
    out = base.join(fitted, [*keys, "__i"]).withColumn(out_col, F.col("__fit"))
    return out.drop("__i", "__n", "__k", "__lo", "__fit")


def rank_components(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str] = (),
    ascending: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-(key, value) ranking components for the scalable rank family:
    ``__mn``/``__mx`` = min/max global 1-based row number among ties and
    ``__n`` = per-key non-null count.

    Every rank method is algebra over these (min → __mn, max → __mx,
    average → (__mn+__mx)/2, pct_rank → (__mn-1)/(__n-1)), so ranking
    becomes: range-partitioned row numbers on a NARROW (keys, value)
    projection (distributed_rank — parallel across partitions, no
    single-task per-key sort), a map-combinable groupBy, and one
    equi-join back on (keys, value). Tie groups are deterministic
    regardless of intra-tie row-number order, and AQE's skew-join
    handles a pathologically hot tied value.
    """
    keys = list(key_cols)
    v = F.col(value_col)
    nn = df.select(*keys, value_col).filter(v.isNotNull())
    if not ascending:
        # rank descending == rank ascending of the negated value; keep
        # the original value column for the join-back.
        nn = nn.withColumn("__negv", -v)
        rn = distributed_rank(nn, "__negv", keys, out_col="__rn",
                              num_partitions=num_partitions)
    else:
        rn = distributed_rank(nn, value_col, keys, out_col="__rn",
                              num_partitions=num_partitions)
    grp = rn.groupBy(*keys, value_col).agg(
        F.min("__rn").alias("__mn"), F.max("__rn").alias("__mx")
    )
    counts = nn.groupBy(*keys).agg(F.count(v).alias("__n"))
    out = (
        grp.join(F.broadcast(counts), on=keys)
        if keys
        else grp.crossJoin(F.broadcast(counts))
    )
    return out


def distributed_prefix_sums(
    df: DataFrame,
    value_cols: Sequence[str],
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = (),
    out_cols: Sequence[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE running sums of several columns over rows ordered by
    ``order_cols`` within each key — the distributed cumsum twin of
    :func:`distributed_rank` (range partition for a global order,
    per-partition window sums in parallel, per-partition totals
    collected at metadata scale and broadcast back as offsets). All
    columns advance over the SAME global order in ONE range shuffle +
    ONE metadata collect (``ks_2sample`` needs both samples' ECDF
    counters aligned). The input must not have duplicate
    ``(key, order)`` tuples if a deterministic result is required."""
    from pyspark.sql.types import FractionalType

    keys = list(key_cols)
    order = list(order_cols)
    vcols = list(value_cols)
    outs = list(out_cols) if out_cols else [f"{c}_prefix" for c in vcols]
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *[F.col(c) for c in [*keys, *order]])
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).localCheckpoint()
    sums = with_pid.groupBy(*keys, "__pid").agg(
        *[F.sum(F.col(c)).alias(f"__s{i}") for i, c in enumerate(vcols)]
    ).collect()
    by_key: dict[tuple, list[tuple[int, list]]] = {}
    for r in sums:
        by_key.setdefault(tuple(r[k] for k in keys), []).append(
            (r["__pid"], [r[f"__s{i}"] for i in range(len(vcols))])
        )
    # float/decimal value columns accumulate in Python floats with a
    # DOUBLE offset; integral columns keep exact long arithmetic
    # (int(s or 0) on a double sum would silently truncate fractions).
    frac = [isinstance(df.schema[c].dataType, FractionalType) for c in vcols]
    rows = []
    for key, lst in by_key.items():
        acc = [0.0 if f else 0 for f in frac]
        for pid, ss in sorted(lst):
            rows.append((*key, pid, *acc))
            acc = [
                a + (float(s or 0.0) if f else int(s or 0))
                for a, s, f in zip(acc, ss, frac)
            ]
    spark = df.sparkSession
    off_schema = ", ".join(
        [f"{k} {df.schema[k].dataType.simpleString()}" for k in keys]
        + ["__pid int"]
        + [f"__off{i} {'double' if f else 'long'}" for i, f in enumerate(frac)]
    )
    offsets = spark.createDataFrame(rows, off_schema)
    local = (
        Window.partitionBy(*keys, "__pid")
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = with_pid.join(F.broadcast(offsets), [*keys, "__pid"])
    for i, (c, oc) in enumerate(zip(vcols, outs)):
        out = out.withColumn(
            oc,
            F.col(f"__off{i}") + F.coalesce(F.sum(F.col(c)).over(local), F.lit(0)),
        )
    return out.drop("__pid", *[f"__off{i}" for i in range(len(vcols))])


def distributed_prefix_sum(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = (),
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Single-column wrapper around :func:`distributed_prefix_sums`
    (kept as the public API used by ``chunk_pack_tokens``)."""
    return distributed_prefix_sums(
        df, [value_col], key_cols, order_cols, [out_col], num_partitions
    )


def seasonal_decompose(
    df: DataFrame,
    value_col: str,
    period: int,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    exact_decimal: str | None = None,
) -> DataFrame:
    """Classical additive decomposition x = trend + seasonal + resid
    (statsmodels ``seasonal_decompose(model='additive')`` semantics,
    re-derived declaratively — statsmodels is absent and row-iterative
    anyway).

    trend: centered moving average of width ``period`` (even periods
    use the standard 2x-MA: window period+1 with half weights at the
    ends), null at the edges like statsmodels. seasonal: per-key
    phase means of the detrended series, centered so one period sums
    to ~0, broadcast back — phase = row_number % period, so an
    irregular grid should be regularized first. resid = x - trend -
    seasonal. Shapes: one (key, ts) window sort + one phase aggregate
    (keys x period rows) broadcast back; no UDF, no iteration.
    ``exact_decimal`` routes the phase-mean sums through decimal for
    order-independent exactness (hash-stable oracles).
    """
    keys = list(key_cols)
    x = F.col(value_col).cast("double")
    w = Window.partitionBy(*keys).orderBy(ts_col)
    half = period // 2
    p = F.lit(float(period))

    def fsum(col, frame):
        # decimal-routed frame sums: order-independent, so the trend is
        # bit-identical across engines/partitionings (low-entropy
        # inputs land EXACTLY on rounding boundaries, where a 1-ulp
        # summation skew flips the displayed value)
        if exact_decimal:
            return F.sum(col.cast(exact_decimal)).over(frame).cast("double")
        return F.sum(col).over(frame)

    if period % 2:
        frame = w.rowsBetween(-half, half)
        n_in = F.count(x).over(frame)
        trend = F.when(n_in == period, fsum(x, frame) / p)
    else:
        # 2x(period)-MA: mean over period+1 rows with the two end rows
        # half-weighted == avg of the two length-`period` windows
        f1 = w.rowsBetween(-half, half - 1)
        f2 = w.rowsBetween(-half + 1, half)
        n1, n2 = F.count(x).over(f1), F.count(x).over(f2)
        trend = F.when(
            (n1 == period) & (n2 == period),
            (fsum(x, f1) / p + fsum(x, f2) / p) / F.lit(2.0),
        )
    out = df.withColumn("trend", trend)
    out = out.withColumn(
        "__phase",
        (F.row_number().over(w) - F.lit(1)) % F.lit(period),
    ).withColumn("__detr", x - F.col("trend"))
    d = F.col("__detr")
    if exact_decimal:
        psum = F.sum(d.cast(exact_decimal)).cast("double")
    else:
        psum = F.sum(d)
    phase_means = (
        out.filter(d.isNotNull())
        .groupBy(*keys, "__phase")
        .agg((psum / F.count(d)).alias("__pm"))
    )
    # center the seasonal so one period sums to ~0 (statsmodels does)
    if keys:
        wk = Window.partitionBy(*keys)
    else:
        wk = Window.partitionBy(F.lit(1))
    if exact_decimal:
        pm_mean = (F.sum(F.col("__pm").cast(exact_decimal)).over(wk)
                   .cast("double") / F.count("__pm").over(wk))
    else:
        pm_mean = F.avg("__pm").over(wk)
    phase_means = phase_means.withColumn(
        "seasonal", F.col("__pm") - pm_mean
    ).drop("__pm")
    out = out.join(F.broadcast(phase_means), on=keys + ["__phase"], how="left")
    return (out.withColumn("resid", x - F.col("trend") - F.col("seasonal"))
            .drop("__phase", "__detr"))


def _centered_lag_sums(
    df: DataFrame,
    value_col: str,
    max_lag: int,
    ts_col: str,
    keys: list[str],
) -> DataFrame:
    """Shared ACF machinery (ljung_box, ar2_yule_walker): per key, the
    integer-quantized centered sums — __n, __den = Σ q6(d_t²), __numk =
    Σ q6(d_t·d_{t-k}) with d_t = x_t − x̄ and q6(p) = floor(p·1e6+0.5).
    The mean itself rides quantized longs, so every output is an exact
    integer (association-free) and any SQL engine reproduces it
    bit-for-bit. One window sort + one aggregate pass."""
    x = F.col(value_col).cast("double")
    base = df.filter(x.isNotNull()).select(*keys, ts_col, x.alias("__x"))
    gb = base.groupBy(*keys) if keys else base.groupBy()
    stats = gb.agg(
        (
            F.sum(F.floor(F.col("__x") * F.lit(1e6) + F.lit(0.5))).cast("double")
            / F.count("__x") / F.lit(1e6)
        ).alias("__mu"),
        F.count("__x").alias("__n"),
    )
    d = (
        base.join(F.broadcast(stats), on=keys) if keys
        else base.crossJoin(F.broadcast(stats))
    ).withColumn("__d", F.col("__x") - F.col("__mu"))
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
         ).orderBy(ts_col)
    for k in range(1, max_lag + 1):
        d = d.withColumn(f"__l{k}", F.lag("__d", k).over(w))

    def _q6(p):  # exact integer partial: floor(p*1e6 + 0.5)
        return F.floor(p * F.lit(1e6) + F.lit(0.5))

    gb2 = d.groupBy(*keys) if keys else d.groupBy()
    return gb2.agg(
        F.max("__n").alias("__n"),
        F.sum(_q6(F.col("__d") * F.col("__d"))).alias("__den"),
        *[
            F.sum(_q6(F.col("__d") * F.col(f"__l{k}"))).alias(f"__num{k}")
            for k in range(1, max_lag + 1)
        ],
    )


def ljung_box(
    df: DataFrame,
    value_col: str,
    max_lag: int,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Ljung-Box portmanteau test per key (Box & Pierce 1970 / Ljung &
    Box 1978, textbook form):

        ρ_k = Σ_{t>k} d_t·d_{t-k} / Σ_t d_t²     (d_t = x_t - x̄)
        Q(h) = n·(n+2)·Σ_{k=1..h} ρ_k² / (n-k)

    One row per lag k = 1..max_lag with (rho, q_stat); Q(h) against
    χ²(h) is the classic "are the residuals white noise" diagnostic
    after a fit (e.g. Holt/Holt-Winters ``fitted`` residuals).

    Scale/determinism shape: one window sort materializes every lagged
    copy; the mean and all cross products ride integer-quantized
    partial sums (floor(x·1e6 + 0.5) / floor(p·1e6 + 0.5) longs —
    exact, association-free, so shuffle order can't move the result
    and the DuckDB oracle matches bit-for-bit); the ≤max_lag-row
    cumulative Σρ²/(n-k) is an integer cumsum of 1e-15-quantized
    terms. No driver data path; per key the agg is one pass.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    keys = list(key_cols)
    agg = _centered_lag_sums(df, value_col, max_lag, ts_col, keys)
    lagrows = agg.select(
        *keys, "__n", "__den",
        F.posexplode(
            F.array(*[F.col(f"__num{k}") for k in range(1, max_lag + 1)])
        ).alias("__p", "__num"),
    ).select(
        *keys, "__n", "__den",
        (F.col("__p") + 1).cast("int").alias("lag"),
        (F.col("__num").cast("double") / F.col("__den").cast("double"))
        .alias("rho"),
    )
    nd = F.col("__n").cast("double")
    term = F.floor(
        F.col("rho") * F.col("rho") / (nd - F.col("lag")) * F.lit(1e15)
        + F.lit(0.5)
    )
    wq = (Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
          ).orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    out = lagrows.withColumn(
        "q_stat",
        nd * (nd + F.lit(2.0)) * (F.sum(term).over(wq).cast("double") / F.lit(1e15)),
    )
    return out.select(*keys, "lag", "rho", "q_stat")


def granger_causality(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Lag-1 Granger-causality F-test per key: does x help predict y
    beyond y's own history? (Granger 1969, textbook nested-OLS form)

        restricted:    y_t = a + b·y_{t-1}            (RSS_r)
        unrestricted:  y_t = a + b·y_{t-1} + c·x_{t-1} (RSS_u)
        F = (RSS_r − RSS_u) / (RSS_u / (n − 3))

    Emits (keys, n, coef_x, f_stat) where coef_x is the unrestricted
    x_{t-1} weight. Everything is ONE window sort (the two lags) +
    ONE aggregate of ten decimal(38,10)-exact sums; both OLS fits are
    closed-form 1- and 2-regressor normal equations on the aggregated
    row (Cramer's rule for the 2×2 system), so the statistic is an
    association-free pure function of the input — same determinism
    contract as :func:`ljung_box` / ``drift.adf_test``. Companion to
    :func:`cross_correlation` (which reports association, not
    incremental predictive power)."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col) if keys else (
        Window.partitionBy(F.lit(1)).orderBy(ts_col)
    )
    u = F.lag(F.col(y_col)).over(w)   # y_{t-1}
    v = F.lag(F.col(x_col)).over(w)   # x_{t-1}
    pre = df.select(
        *keys,
        F.col(y_col).alias("__w"),
        u.alias("__u"),
        v.alias("__v"),
    ).where(F.col("__u").isNotNull() & F.col("__v").isNotNull())
    dec = "decimal(38,10)"
    wc, uc, vc = F.col("__w"), F.col("__u"), F.col("__v")

    def _s(e, name):
        return F.sum(e.cast(dec)).cast("double").alias(name)

    agg = pre.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        _s(uc, "__su"), _s(vc, "__sv"), _s(wc, "__sw"),
        _s(uc * uc, "__suu"), _s(vc * vc, "__svv"), _s(uc * vc, "__suv"),
        _s(uc * wc, "__suw"), _s(vc * wc, "__svw"), _s(wc * wc, "__sww"),
    )
    n = F.col("n").cast("double")
    suu = F.col("__suu") - F.col("__su") * F.col("__su") / n
    svv = F.col("__svv") - F.col("__sv") * F.col("__sv") / n
    suv = F.col("__suv") - F.col("__su") * F.col("__sv") / n
    suw = F.col("__suw") - F.col("__su") * F.col("__sw") / n
    svw = F.col("__svw") - F.col("__sv") * F.col("__sw") / n
    sww = F.col("__sww") - F.col("__sw") * F.col("__sw") / n
    rss_r = sww - suw * suw / suu
    det = suu * svv - suv * suv
    b = (svv * suw - suv * svw) / det
    c = (suu * svw - suv * suw) / det
    rss_u = sww - b * suw - c * svw
    f_stat = (rss_r - rss_u) / (rss_u / (n - F.lit(3.0)))
    q6 = lambda col: F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return agg.select(*keys, "n", q6(c).alias("coef_x"), q6(f_stat).alias("f_stat"))


def ar2_yule_walker(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """AR(2) fit per key via the Yule-Walker closed form (Box &
    Jenkins 1970, textbook):

        φ1 = ρ1·(1-ρ2) / (1-ρ1²)
        φ2 = (ρ2-ρ1²) / (1-ρ1²)
        σ² = c0·(1 - φ1·ρ1 - φ2·ρ2)      (innovation variance,
                                           c0 = Σd²/n)

    with ρ_k the standard Box-Jenkins autocorrelation estimator.
    Output: keys + (rho1, rho2, phi1, phi2, sigma2). AR(p>2) needs a
    Toeplitz solve (driver-side at keys×p² metadata scale) — not
    shipped; p=2 covers the classic damped-oscillation diagnostics and
    stays fully closed-form on any SQL engine.

    Same determinism shape as :func:`ljung_box`: every sum is an
    integer-quantized partial (one window sort, one aggregate pass),
    so the result is a pure function of the input.
    """
    keys = list(key_cols)
    agg = _centered_lag_sums(df, value_col, 2, ts_col, keys)
    den = F.col("__den").cast("double")
    rho1 = (F.col("__num1").cast("double") / den).alias("rho1")
    rho2 = (F.col("__num2").cast("double") / den).alias("rho2")
    out = agg.select(*keys, "__n", "__den", rho1, rho2)
    r1, r2 = F.col("rho1"), F.col("rho2")
    disc = F.lit(1.0) - r1 * r1
    phi1 = (r1 * (F.lit(1.0) - r2) / disc).alias("phi1")
    phi2 = ((r2 - r1 * r1) / disc).alias("phi2")
    out = out.select(*keys, "__n", "__den", "rho1", "rho2", phi1, phi2)
    c0 = (
        F.col("__den").cast("double") / F.lit(1e6)
        / F.col("__n").cast("double")
    )
    sigma2 = (
        c0 * (F.lit(1.0) - F.col("phi1") * r1 - F.col("phi2") * r2)
    ).alias("sigma2")
    return out.select(*keys, "rho1", "rho2", "phi1", "phi2", sigma2)


def forecast_accuracy(
    df: DataFrame,
    actual_col: str,
    pred_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    season_length: int = 1,
) -> DataFrame:
    """Forecast-accuracy battery per key (Hyndman & Koehler 2006,
    textbook): MAE, RMSE, sMAPE (the 0–200 form), and MASE — the MAE
    scaled by the in-sample seasonal-naive error
    mean|y_t − y_{t−m}| over the SAME frame (m = ``season_length``;
    m=1 is the random-walk naive).

    One window sort (the naive lag) + one aggregate pass; every term
    rides integer-quantized partials (floor(v·1e6 + 0.5) longs), so
    the result is association-free and a SQL oracle reproduces it
    bit-for-bit. Output: keys + (n, mae, rmse, smape, mase).
    """
    m = int(season_length)
    if m < 1:
        raise ValueError(f"season_length must be >= 1, got {m}")
    keys = list(key_cols)
    y = F.col(actual_col).cast("double")
    p = F.col(pred_col).cast("double")
    base = df.filter(y.isNotNull() & p.isNotNull()).select(
        *keys, ts_col, y.alias("__y"), p.alias("__p")
    )
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
         ).orderBy(ts_col)
    base = base.withColumn("__ynaive", F.lag("__y", m).over(w))

    def _q6(v):
        return F.floor(v * F.lit(1e6) + F.lit(0.5))

    e = F.col("__y") - F.col("__p")
    ae = F.abs(e)
    smape_term = F.lit(2.0) * ae / (F.abs(F.col("__y")) + F.abs(F.col("__p")))
    naive_ae = F.abs(F.col("__y") - F.col("__ynaive"))
    gb = base.groupBy(*keys) if keys else base.groupBy()
    agg = gb.agg(
        F.count("__y").alias("n"),
        F.sum(_q6(ae)).alias("__sae"),
        F.sum(_q6(e * e)).alias("__se2"),
        F.sum(_q6(smape_term)).alias("__ssm"),
        F.sum(_q6(naive_ae)).alias("__snv"),
        F.count("__ynaive").alias("__nnv"),
    )
    nd = F.col("n").cast("double")
    mae = F.col("__sae").cast("double") / nd / F.lit(1e6)
    rmse = F.sqrt(F.col("__se2").cast("double") / nd / F.lit(1e6))
    smape = F.col("__ssm").cast("double") / nd / F.lit(1e6) * F.lit(1e2)
    naive_mae = (
        F.col("__snv").cast("double") / F.col("__nnv").cast("double")
        / F.lit(1e6)
    )
    return agg.select(
        *keys, "n",
        mae.alias("mae"),
        rmse.alias("rmse"),
        smape.alias("smape"),
        (mae / naive_mae).alias("mase"),
    )


def pacf(
    df: DataFrame,
    value_col: str,
    max_lag: int = 3,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Partial autocorrelation at lags 1..max_lag (≤3) per key, via the
    Yule-Walker closed forms (Durbin-Levinson unrolled for fixed k —
    Box & Jenkins 1970, the standard companion plot to ACF for AR-order
    selection; reference analog: tstoolbox/functions/correlation.py
    ships ACF only):

        φ11 = ρ1
        φ22 = (ρ2 − ρ1²) / (1 − ρ1²)
        φ33 = det(M3) / det(T3)   (Cramer on the 3×3 Toeplitz system)

    Higher orders need a driver-side Toeplitz solve at keys×p² metadata
    scale — out of scope, matching :func:`ar2_yule_walker`.

    Output: keys + (lag, pacf), one row per lag. Determinism shape:
    the same integer-quantized centered sums as :func:`ljung_box`
    (one window sort + one aggregate pass), so the ρ_k — and therefore
    every pacf value — are exact functions of the input on any engine.
    """
    if not 1 <= max_lag <= 3:
        raise ValueError(f"max_lag must be in 1..3, got {max_lag}")
    keys = list(key_cols)
    agg = _centered_lag_sums(df, value_col, max_lag, ts_col, keys)
    den = F.col("__den").cast("double")
    rhos = [
        (F.col(f"__num{k}").cast("double") / den).alias(f"__r{k}")
        for k in range(1, max_lag + 1)
    ]
    base = agg.select(*keys, *rhos)
    r = [None] + [F.col(f"__r{k}") for k in range(1, max_lag + 1)]
    vals: list[Column] = [r[1]]
    if max_lag >= 2:
        vals.append((r[2] - r[1] * r[1]) / (F.lit(1.0) - r[1] * r[1]))
    if max_lag >= 3:
        det_t = (
            F.lit(1.0) * (F.lit(1.0) - r[1] * r[1])
            - r[1] * (r[1] - r[1] * r[2])
            + r[2] * (r[1] * r[1] - r[2])
        )
        det_m = (
            F.lit(1.0) * (r[3] - r[2] * r[1])
            - r[1] * (r[1] * r[3] - r[2] * r[2])
            + r[1] * (r[1] * r[1] - r[2])
        )
        vals.append(det_m / det_t)
    lagged = F.array(
        *[
            F.struct(F.lit(k + 1).alias("lag"), v.cast("double").alias("pacf"))
            for k, v in enumerate(vals)
        ]
    )
    ex = base.select(*keys, F.explode(lagged).alias("__e"))
    return ex.select(*keys, F.col("__e.lag").alias("lag"), F.col("__e.pacf").alias("pacf"))


def pearson_matrix(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    check_unique: bool = False,
) -> DataFrame:
    """Pairwise Pearson correlation between every pair of series keyed
    by ``key_col``, aligned on ``ts_col`` (inner alignment — only
    instants both series observe). One self-equi-join on the time
    axis and one map-combinable aggregate per pair; every moment term
    is quantized to 1e-6 and summed as BIGINT so the statistic is
    association-free and engine-exact.

    PRECONDITION: one row per (key, ts) — the same shape pandas
    ``pivot().corr()`` requires. Duplicate timestamps within a key
    would cross-product through the self-join and silently inflate
    the moments; aggregate to a grid first (as the driver query
    does), or pass ``check_unique=True`` to pay one extra aggregate
    that raises on violations.

    Output: (key_a, key_b, r, n) for key_a < key_b. Pair count grows
    as |keys|², so this is for panel widths (dozens of series), not
    key cardinalities — the same contract as pandas DataFrame.corr().
    """
    if check_unique:
        dup = (
            df.groupBy(key_col, ts_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dup:
            raise ValueError(
                f"pearson_matrix: {dup} duplicate ({key_col}, {ts_col}) "
                "groups — aggregate to one row per (key, ts) first"
            )
    # null values would be counted in n by the joined-row count while
    # dropping out of the quantized moment sums, silently skewing r —
    # exclude them up front so n and the moments stay consistent
    df = df.filter(F.col(value_col).isNotNull())
    a = df.select(
        F.col(key_col).alias("key_a"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("__x"),
    )
    b = df.select(
        F.col(key_col).alias("key_b"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).alias("__y"),
    )
    pairs = a.join(b, "__ts").filter(F.col("key_a") < F.col("key_b"))
    q = lambda c: F.floor(c * 1e6 + 0.5).cast("long")  # noqa: E731
    x, y = F.col("__x"), F.col("__y")
    g = pairs.groupBy("key_a", "key_b").agg(
        F.count("*").alias("n"),
        F.sum(q(x)).alias("__sx"),
        F.sum(q(y)).alias("__sy"),
        F.sum(q(x * y)).alias("__sxy"),
        F.sum(q(x * x)).alias("__sxx"),
        F.sum(q(y * y)).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double") / 1e6
    sy = F.col("__sy").cast("double") / 1e6
    sxy = F.col("__sxy").cast("double") / 1e6
    sxx = F.col("__sxx").cast("double") / 1e6
    syy = F.col("__syy").cast("double") / 1e6
    r = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return g.select(
        "key_a", "key_b", F.round(r, 6).alias("r"),
        F.col("n").cast("long").alias("n"),
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.9),
    key_cols: Sequence[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """EXACT percentile_disc reads for UNBOUNDED value domains: the
    smallest value whose cumulative count reaches ceil(q·n) — the
    same convention as ``rollup.hist_quantiles``, but computed from
    ``rank_components`` (range-partitioned parallel ranking) instead
    of a bounded-domain histogram, so it scales to high-cardinality
    columns (latencies, byte sizes) without a single-task key sort.

    One row per key with a column per requested quantile
    (``p50``-style names, hist_quantiles convention).
    """
    keys = list(key_cols)
    comps = rank_components(df, value_col, keys, num_partitions=num_partitions)
    # __mx = max rank among ties = cumulative count through the value
    aggs = []
    for q in qs:
        thr = F.greatest(
            F.ceil(F.lit(float(q)) * F.col("__n")), F.lit(1)
        )
        aggs.append(
            F.min(
                F.when(F.col("__mx") >= thr, F.col(value_col))
            ).alias(f"p{str(q).replace('0.', '').ljust(2, '0')}")
        )
    grp = comps.groupBy(*keys) if keys else comps.groupBy()
    return grp.agg(F.max("__n").alias("n"), *aggs)


def robust_anomaly_flags(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str] = (),
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier flags per key — the monitoring read
    over decomposition residuals (x is anomalous when
    |x − median| > k·MAD, the Hampel identifier; k=3 ≈ 4.5σ under
    normality since MAD ≈ 0.6745σ).

    Both location and scale come from :func:`exact_quantiles`
    (range-partitioned rank components — no single-task sort, exact
    percentile_disc semantics), and the per-key stats broadcast back,
    so the whole read is two distributed ranking passes + two
    broadcast joins regardless of key cardinality. Feeding a
    pre-quantized integer column (the seasonal_decompose convention)
    keeps every comparison on exact integers — engine-portable with
    no float-ordering hazard.

    Adds ``median``, ``mad``, ``is_anomaly`` (int; a zero-MAD key
    flags only values different from the median).

    The input lineage is consumed ~5× (two ranking passes, each with
    the range partitioner's sampling job, plus the stat joins), so it
    is pinned ONCE with localCheckpoint — the distributed_rank idiom
    — rather than recomputing the upstream plan per pass (gated
    bench: 6.1 s → sub-second on the hourly-residual query).
    """
    keys = list(key_cols)
    df = df.localCheckpoint()
    n = df.count()
    # Two stat passes over the pinned input. Below the threshold the
    # native percentile_disc aggregate (identical smallest-value-at-
    # ceil(q·n) convention; cast back since Spark returns DOUBLE) is
    # one cheap hash/sort aggregate — the rank-components machinery's
    # fixed job count (range sample, shuffle, persist, counts,
    # join-back) costs seconds of overhead that tiny inputs never
    # repay. Above it, rank components keep the per-key sort off a
    # single task; the range shuffle is sized to the input with the
    # session parallelism as ceiling.
    small = n <= 4_000_000
    default_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    n_parts = max(1, min(default_parts, n // 100_000 + 1))

    def _stat(frame, col, name):
        if small:
            vt = frame.schema[col].dataType.simpleString()
            grp = frame.groupBy(*keys) if keys else frame.groupBy()
            s = grp.agg(
                F.expr(
                    f"percentile_disc(0.5) WITHIN GROUP (ORDER BY `{col}`)"
                )
                .cast(vt)
                .alias(name)
            )
        else:
            s = exact_quantiles(
                frame, col, (0.5,), keys, num_partitions=n_parts
            ).select(*keys, F.col("p50").alias(name))
        return F.broadcast(s)

    med = _stat(df, value_col, "median")
    j = df.join(med, keys) if keys else df.crossJoin(med)
    dev = j.withColumn(
        "__absdev", F.abs(F.col(value_col) - F.col("median"))
    )
    mad = _stat(dev, "__absdev", "mad")
    out = dev.join(mad, keys) if keys else dev.crossJoin(mad)
    # a zero-MAD key degenerates to flagging any deviation (> k·0)
    flag = (F.col("__absdev") > F.lit(float(k)) * F.col("mad")).cast("int")
    return out.withColumn("is_anomaly", flag).drop("__absdev")
