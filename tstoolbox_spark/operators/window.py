"""Window verbs: rolling_window, expanding_window, ewm_window, lag,
pct_change, rank.

Reference semantics:
- rolling_window: /root/reference/tstoolbox/functions/rolling_window.py
  :219-302 — per column ``rolling(window, min_periods, center).stat()``
  for stat ∈ {corr,count,cov,kurt,max,mean,median,min,quantile,skew,
  std,sum,var}; int window = row frame (default 2), offset string =
  time-range frame. Output columns suffixed ``_rolling_<win>_<stat>``
  (reference uses ``::rolling.<win>.<stat>``, rolling_window.py:295-298).
- expanding_window: functions/expanding_window.py:140-184.
- ewm_window: functions/ewm_window.py:186-241 (default-α path only —
  the reference's kwarg-name bug limits its own oracle to defaults).
- lag: functions/lag.py:74-138 (shifted copies named ``<col>_<i>``).
- pct_change: functions/pct_change.py:108-156.
- rank: functions/rank.py:145-196.

Scale design: one logical sort per series key serves every window
expression (Spark reuses the (key, ts) sort across window specs with
identical partitioning/ordering). Row frames are ``rowsBetween``; time
frames are ``rangeBetween`` over epoch seconds — both stay inside
whole-stage codegen. Only EWM needs pandas (sequential recurrence),
via one grouped-map UDF per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .core import epoch_micros, parse_freq

ROLLING_STATS = (
    "count",
    "sum",
    "mean",
    "median",
    "min",
    "max",
    "std",
    "var",
    "skew",
    "kurt",
    "quantile",
)


def _frame(
    keys: Sequence[str], ts_col: str, window: int | str, center: bool
):
    """Build the WindowSpec for an int row-count window or a pandas
    offset-string time window (right-closed, matching pandas)."""
    if isinstance(window, int):
        w = Window.partitionBy(*keys).orderBy(ts_col)
        if center:
            # pandas center=True: extra row goes BEFORE for even windows.
            lead = (window - 1) // 2
            return w.rowsBetween(-(window - 1 - lead), lead)
        return w.rowsBetween(-(window - 1), 0)
    _, secs = parse_freq(window)
    w = Window.partitionBy(*keys).orderBy(epoch_micros(F.col(ts_col)))
    # pandas time rolling: window covers (t - delta, t] — strictly
    # greater than t-delta. Epoch micros are integral, so subtracting
    # (delta_micros - 1) excludes the open endpoint exactly.
    return w.rangeBetween(-(secs * 1_000_000 - 1), 0)


def _stat_expr(v: Column, stat: str, quantile: float) -> Column:
    if stat == "count":
        return F.count(v)
    if stat == "sum":
        return F.sum(v)
    if stat == "mean":
        return F.avg(v)
    if stat == "median":
        return F.percentile(v, F.lit(0.5))
    if stat == "quantile":
        return F.percentile(v, F.lit(quantile))
    if stat == "min":
        return F.min(v)
    if stat == "max":
        return F.max(v)
    if stat == "std":
        return F.stddev_samp(v)
    if stat == "var":
        return F.var_samp(v)
    if stat == "skew":
        return F.skewness(v)
    if stat == "kurt":
        return F.kurtosis(v)
    raise ValueError(f"unknown rolling statistic {stat!r}")


def rolling_window(
    df: DataFrame,
    statistic: str | Sequence[str],
    window: int | str = 2,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    min_periods: int | None = None,
    center: bool = False,
    quantile: float = 0.5,
) -> DataFrame:
    """Rolling statistics; output columns ``<col>_rolling_<window>_<stat>``."""
    stats = [statistic] if isinstance(statistic, str) else list(statistic)
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    if min_periods is None:
        # pandas: int windows default min_periods=window; offset windows 1.
        min_periods = window if isinstance(window, int) else 1
    frame = _frame(key_cols, ts_col, window, center)
    out = df
    for c in value_cols:
        v = F.col(c)
        n = F.count(v).over(frame)
        for s in stats:
            name = f"{c}_rolling_{window}_{s}"
            expr = _stat_expr(v, s, quantile).over(frame)
            # pandas emits NaN until min_periods non-null obs are in frame.
            out = out.withColumn(name, F.when(n >= min_periods, expr))
    return out


def expanding_window(
    df: DataFrame,
    statistic: str | Sequence[str],
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    min_periods: int = 1,
) -> DataFrame:
    """Expanding statistics, frame = start..current.
    Ref: functions/expanding_window.py:171-180."""
    stats = [statistic] if isinstance(statistic, str) else list(statistic)
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    frame = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in value_cols:
        v = F.col(c)
        n = F.count(v).over(frame)
        for s in stats:
            name = f"{c}_expanding_{s}"
            out = out.withColumn(
                name, F.when(n >= min_periods, _stat_expr(v, s, 0.5).over(frame))
            )
    return out


def ewm_window(
    df: DataFrame,
    statistic: str = "mean",
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    com: float | None = None,
    span: float | None = None,
    halflife: float | None = None,
    alpha: float | None = None,
    min_periods: int = 0,
    adjust: bool = True,
) -> DataFrame:
    """Exponentially weighted mean/std/var. Sequential recurrence → one
    grouped-map pandas UDF per series key (bit-exact vs the pandas
    oracle). Ref: functions/ewm_window.py:222-230."""
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    keys = list(key_cols)
    new_cols = ", ".join(f"{c}_ewm_{statistic} double" for c in value_cols)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{schema}, {new_cols}"
    kw = dict(com=com, span=span, halflife=halflife, alpha=alpha)
    kw = {k: v for k, v in kw.items() if v is not None}

    def _ewm(pdf):
        pdf = pdf.sort_values(ts_col)
        for c in value_cols:
            ew = pdf[c].ewm(min_periods=min_periods, adjust=adjust, **kw)
            pdf[f"{c}_ewm_{statistic}"] = getattr(ew, statistic)()
        return pdf

    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(_ewm, schema=schema)


def lag(
    df: DataFrame,
    lags: int | Sequence[int] = 1,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Append shifted copies ``<col>_<i>`` for each lag i.
    Ref: functions/lag.py:120-135. Negative i = lead."""
    lag_list = list(range(1, lags + 1)) if isinstance(lags, int) else list(lags)
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    out = df
    for c in value_cols:
        for i in lag_list:
            out = out.withColumn(f"{c}_{i}", F.lag(F.col(c), i).over(w))
    return out


def pct_change(
    df: DataFrame,
    periods: int = 1,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    fill_method: str | None = "pad",
) -> DataFrame:
    """Fractional change vs ``periods`` rows earlier; pandas pads nulls
    forward first by default. Ref: functions/pct_change.py:152-154."""
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    w_prev = w.rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in value_cols:
        v = F.col(c)
        if fill_method == "pad":
            v = F.last(v, ignorenulls=True).over(w_prev)
        out = out.withColumn(f"{c}_pct_change", v / F.lag(v, periods).over(w) - 1)
    return out


def rank(
    df: DataFrame,
    method: str = "average",
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    ascending: bool = True,
    pct: bool = False,
) -> DataFrame:
    """Rank values within each series. Ref: functions/rank.py:190-195.

    method ∈ average/min/max/first/dense. 'average' = rank + (ties-1)/2
    (the mean of the tied row numbers); nulls keep null rank
    (pandas na_option='keep').

    Scale shape: ``Window.partitionBy(series_key).orderBy(value)``
    sorts each key's ENTIRE data in one task — a straggler at 100 TB
    with low-cardinality keys. Instead each column routes through
    stats.rank_components (range-partitioned parallel row numbers on a
    narrow projection + per-(key, value) min/max) and joins the rank
    expression back on (keys, value); 'first' needs per-row tie order,
    so it attaches stats.distributed_rank directly with ``ts_col`` as
    the tiebreak. No per-key single-task sort anywhere.
    """
    from .stats import distributed_rank, rank_components

    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    if method not in ("average", "min", "max", "first", "dense"):
        raise ValueError(f"unknown rank method {method!r}")
    keys = list(key_cols)
    out = df
    for c in value_cols:
        v = F.col(c)
        if method == "first":
            nn = out.filter(v.isNotNull())
            ranked = distributed_rank(
                nn if ascending else nn.withColumn("__negv", -v),
                c if ascending else "__negv",
                keys,
                tiebreak_cols=[ts_col],  # ties keep input (time) order
                out_col="__rnk",
            )
            r = F.col("__rnk").cast("double")
            if pct:
                counts = nn.groupBy(*keys).agg(F.count(v).alias("__n"))
                ranked = (
                    ranked.join(F.broadcast(counts), on=keys)
                    if keys
                    else ranked.crossJoin(F.broadcast(counts))
                )
                r = r / F.col("__n")
            ranked = ranked.withColumn(f"{c}_rank", r).drop("__rnk", "__n", "__negv")
            nulls = out.filter(v.isNull()).withColumn(
                f"{c}_rank", F.lit(None).cast("double")
            )
            out = ranked.unionByName(nulls)
            continue
        comps = rank_components(out, c, keys, ascending=ascending)
        if method == "min":
            r = F.col("__mn").cast("double")
        elif method == "max":
            r = F.col("__mx").cast("double")
        elif method == "average":
            r = (F.col("__mn") + F.col("__mx")) / 2.0
        else:  # dense: rank of the distinct value within the key
            duniq = comps.select(*keys, c)
            if not ascending:
                duniq = duniq.withColumn("__negv", -F.col(c))
            dense = distributed_rank(
                duniq, c if ascending else "__negv", keys, out_col="__dr"
            ).drop("__negv")
            nd = dense.groupBy(*keys).agg(F.count(F.lit(1)).alias("__nd"))
            comps = comps.join(dense, [*keys, c])
            comps = (
                comps.join(F.broadcast(nd), on=keys)
                if keys
                else comps.crossJoin(F.broadcast(nd))
            )
            r = F.col("__dr").cast("double")
        if pct:
            # pandas pct semantics: dense divides by the DISTINCT value
            # count, every other method by the non-null row count.
            r = r / (F.col("__nd") if method == "dense" else F.col("__n"))
        comps = comps.select(*keys, c, r.alias(f"{c}_rank"))
        out = out.join(comps, [*keys, c], "left")
    return out


def rolling_corr(
    df: DataFrame,
    col_a: str,
    col_b: str,
    window: int = 2,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    min_periods: int | None = None,
    stat: str = "corr",
) -> DataFrame:
    """Rolling pairwise Pearson correlation / sample covariance between
    two columns (the reference's rolling corr/cov stats,
    rolling_window.py:189-218) — closed form over frame sums so the
    whole expression stays in whole-stage codegen on one (key, ts)
    sort.
    """
    if stat not in ("corr", "cov"):
        raise ValueError(f"stat must be 'corr' or 'cov', got {stat!r}")
    if min_periods is None:
        min_periods = window
    frame = _frame(key_cols, ts_col, window, center=False)
    a, b = F.col(col_a), F.col(col_b)
    both = F.when(a.isNotNull() & b.isNotNull(), 1)
    n = F.sum(both).over(frame).cast("double")
    ab = lambda x: F.when(both.isNotNull(), x)  # noqa: E731 — pairwise-complete
    sa = F.sum(ab(a)).over(frame)
    sb = F.sum(ab(b)).over(frame)
    sab = F.sum(ab(a * b)).over(frame)
    cov = (sab - sa * sb / n) / (n - 1)
    if stat == "cov":
        expr = cov
    else:
        saa = F.sum(ab(a * a)).over(frame)
        sbb = F.sum(ab(b * b)).over(frame)
        var_a = (saa - sa * sa / n) / (n - 1)
        var_b = (sbb - sb * sb / n) / (n - 1)
        expr = cov / F.sqrt(var_a * var_b)
    name = f"{col_a}_{col_b}_rolling_{window}_{stat}"
    return df.withColumn(name, F.when(n >= min_periods, expr))


def ewm_pairwise(
    df: DataFrame,
    col_a: str,
    col_b: str,
    stat: str = "corr",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    com: float | None = None,
    span: float | None = None,
    halflife: float | None = None,
    alpha: float | None = None,
    min_periods: int = 0,
    adjust: bool = True,
) -> DataFrame:
    """Exponentially weighted pairwise corr/cov between two columns
    (ref ewm_window.py:232-238 `ewm().corr()/.cov()` — its alpha_*
    kwargs never reached pandas, so default-decay semantics are the
    reference's tested envelope; here the decay kwargs actually work).
    Sequential recurrence → per-key grouped map like ewm_window."""
    if stat not in ("corr", "cov"):
        raise ValueError(f"stat must be corr/cov, got {stat!r}")
    keys = list(key_cols)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_col = f"{col_a}_{col_b}_ewm_{stat}"
    schema = f"{schema}, {out_col} double"
    kw = dict(com=com, span=span, halflife=halflife, alpha=alpha)
    kw = {k: v for k, v in kw.items() if v is not None}

    def _ewm2(pdf):
        pdf = pdf.sort_values(ts_col)
        ew = pdf[col_a].ewm(min_periods=min_periods, adjust=adjust, **kw)
        pdf[out_col] = getattr(ew, stat)(pdf[col_b])
        return pdf

    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(_ewm2, schema=schema)


def rolling_mad_outliers(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    window: int = 11,
    k: float = 3.0,
) -> DataFrame:
    """Robust anomaly flags over a series: centered rolling median +
    MAD (median absolute deviation), flagging |x - med| > k*MAD.

    Engine extension (no reference verb): the standard monitoring pass
    over materialized tier tables — median/MAD shrug off the very
    outliers that poison mean/stddev-based z-scores. One (key, ts)
    window sort; medians are EXACT middle elements of the sorted
    ``window``-row frame (window forced odd), never interpolated, so
    the values are bit-reproducible and SQL-mirrorable. Edge rows with
    an incomplete frame get null med/mad/flag. O(window log window)
    per row, no shuffle beyond the window sort, no UDF.
    """
    window += 1 - window % 2
    h = window // 2
    w = (Window.partitionBy(*key_cols).orderBy(ts_col)
         .rowsBetween(-h, h))
    x = F.col(value_col).cast("double")
    out = df.withColumn("__arr", F.collect_list(x).over(w))
    full = F.size(F.col("__arr")) == F.lit(window)
    med = F.element_at(F.array_sort(F.col("__arr")), h + 1)
    out = out.withColumn("med", F.when(full, med))
    mad = F.element_at(
        F.array_sort(
            F.transform(F.col("__arr"),
                        lambda v: F.abs(v - F.col("med")))
        ),
        h + 1,
    )
    out = out.withColumn("mad", F.when(full, mad))
    return out.withColumn(
        "is_outlier",
        F.when(full, F.abs(x - F.col("med")) > F.lit(float(k)) * F.col("mad")),
    ).drop("__arr")


def cusum_changepoints(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    drift_k: float = 0.5,
    threshold_h: float = 5.0,
    exact_decimal: str | None = None,
) -> DataFrame:
    """Two-sided CUSUM mean-shift detection per key.

    Engine extension (no reference verb): the standard changepoint
    monitor over tier tables. The textbook recursion
    ``s_i = max(0, s_{i-1} + dev_i)`` looks sequential, but
    ``s_i = P_i - min_{j<=i} P_j`` with ``P`` the prefix sum of
    deviations — so both sides compile to ONE key-window sort with a
    running sum and a running min, no UDF, no recursion. Deviations
    are standardized against the key's global mean/std (one
    map-side-combinable aggregate broadcast back; ``exact_decimal``
    routes the moment sums through decimal for order-independent
    exactness). Flags rows where either side exceeds
    ``threshold_h * sigma``.
    """
    keys = list(key_cols)
    x = F.col(value_col).cast("double")
    if exact_decimal:
        sy = F.sum(x.cast(exact_decimal)).cast("double")
        syy = F.sum(x.cast(exact_decimal) * x.cast(exact_decimal)).cast("double")
    else:
        sy, syy = F.sum(x), F.sum(x * x)
    n = F.count(F.lit(1)).cast("double")
    stats = df.groupBy(*keys).agg(
        sy.alias("__sy"), syy.alias("__syy"), n.alias("__n")
    ).select(
        *keys,
        (F.col("__sy") / F.col("__n")).alias("__mu"),
        F.sqrt(
            (F.col("__syy") - F.col("__sy") * F.col("__sy") / F.col("__n"))
            / (F.col("__n") - F.lit(1.0))
        ).alias("__sigma"),
    )
    out = (df.join(F.broadcast(stats), on=keys, how="left")
           if keys else df.crossJoin(F.broadcast(stats)))
    base = Window.partitionBy(*keys).orderBy(ts_col)
    run = base.rowsBetween(Window.unboundedPreceding, 0)
    kd = F.lit(float(drift_k)) * F.col("__sigma")
    dev_p = x - F.col("__mu") - kd
    dev_n = (F.col("__mu") - x) - kd
    if exact_decimal:
        # accumulate the prefix sums in decimal: float running sums
        # drift ~1e-13 between engines/plans (accumulator internals),
        # which rounding then surfaces as 1e-6 flips on boundary rows;
        # decimal prefix sums are exact and order-independent.
        acc = "decimal(38,9)"
        pp = F.sum(dev_p.cast(acc)).over(run).cast("double")
        pn = F.sum(dev_n.cast(acc)).over(run).cast("double")
    else:
        pp = F.sum(dev_p).over(run)
        pn = F.sum(dev_n).over(run)
    out = out.withColumn("__pp", pp).withColumn("__pn", pn)
    cus_p = F.col("__pp") - F.least(F.min("__pp").over(run), F.lit(0.0))
    cus_n = F.col("__pn") - F.least(F.min("__pn").over(run), F.lit(0.0))
    h = F.lit(float(threshold_h)) * F.col("__sigma")
    return (out.withColumn("cusum_pos", cus_p)
            .withColumn("cusum_neg", cus_n)
            .withColumn("shift_up", F.col("cusum_pos") > h)
            .withColumn("shift_down", F.col("cusum_neg") > h)
            .drop("__sy", "__syy", "__n", "__mu", "__sigma", "__pp", "__pn"))


def drawdown(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Running peak and drawdown per key: ``peak`` = running max of the
    series so far, ``drawdown`` = value − peak (≤ 0), ``drawdown_pct``
    = drawdown / peak (null while peak ≤ 0). The classic
    high-water-mark diagnostic for any cumulative KPI (loss curves,
    account balances, throughput). Max drawdown per key is one
    ``groupBy().min("drawdown")`` away.

    One window sort per key (running max is a plain prefix
    aggregate); no joins, no driver state.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    peak = F.max(F.col(value_col)).over(w)
    dd = F.col(value_col) - peak
    return df.select(
        *df.columns,
        peak.alias("peak"),
        dd.alias("drawdown"),
        F.when(peak > 0, dd / peak).alias("drawdown_pct"),
    )
