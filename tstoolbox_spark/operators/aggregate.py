"""``aggregate`` — downsample a series to a coarser grid, computing one
output column per (value column × statistic).

Reference semantics: /root/reference/tstoolbox/functions/aggregate.py
:129-246 — statistics {mean,sum,std,sem,max,min,median,first,last,ohlc}
(validator at :108-128), groupby frequency codes plus the special
groupbys ``all`` (single row labeled by the last timestamp, :227-232)
and ``months_across_years`` (12 rows keyed by month-of-year, :233-235).

Spark-first design
------------------
The bucket key is ``date_trunc(unit, ts)`` (or an epoch-floored window
start for n-multiples) — a narrow expression, so the only shuffle is
the groupBy itself, which Catalyst executes as partial (map-side)
aggregation + final merge. Every statistic below decomposes into
algebraic partials (sum/count/min/max/m2) except median, which uses
exact ``percentile`` to match pandas' interpolated median
(Spark ``median``/``percentile`` exact implementations agree with
pandas linear interpolation).

first/last are time-ordered, null-skipping: expressed as min/max over
a (ts, value) struct filtered to non-null values, which stays a single
shuffle-free-partial aggregate (no window, no sort).

Output naming: ``{col}_{stat}`` (the reference's ``col::stat`` suffix
scheme, aggregate.py:240, with ``_`` since ``:`` is awkward in SQL
identifiers).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .core import parse_freq

STATISTICS = (
    "mean",
    "sum",
    "std",
    "sem",
    "max",
    "min",
    "median",
    "first",
    "last",
    "count",
    "ohlc",
)


def _stat_exprs(col: str, stat: str, ts_col: str) -> list[Column]:
    v = F.col(col)
    nn_struct = F.when(v.isNotNull(), F.struct(F.col(ts_col).alias("t"), v.alias("v")))
    if stat == "mean":
        return [F.avg(v).alias(f"{col}_mean")]
    if stat == "sum":
        return [F.sum(v).alias(f"{col}_sum")]
    if stat == "std":
        return [F.stddev_samp(v).alias(f"{col}_std")]
    if stat == "sem":
        return [(F.stddev_samp(v) / F.sqrt(F.count(v))).alias(f"{col}_sem")]
    if stat == "max":
        return [F.max(v).alias(f"{col}_max")]
    if stat == "min":
        return [F.min(v).alias(f"{col}_min")]
    if stat == "median":
        return [F.percentile(v, F.lit(0.5)).alias(f"{col}_median")]
    if stat == "count":
        return [F.count(v).alias(f"{col}_count")]
    if stat == "first":
        return [F.min(nn_struct).getField("v").alias(f"{col}_first")]
    if stat == "last":
        return [F.max(nn_struct).getField("v").alias(f"{col}_last")]
    if stat == "ohlc":
        return [
            F.min(nn_struct).getField("v").alias(f"{col}_open"),
            F.max(v).alias(f"{col}_high"),
            F.min(v).alias(f"{col}_low"),
            F.max(nn_struct).getField("v").alias(f"{col}_close"),
        ]
    raise ValueError(f"unknown statistic {stat!r}; choose from {STATISTICS}")


def bucket_expr(ts_col: str, freq: str) -> Column:
    """Bucket label = start instant of the containing interval.

    Calendar units and 1-multiples use ``date_trunc``; n-multiples of
    fixed units floor epoch seconds (epoch-anchored windows — the
    documented divergence from pandas' first-day anchoring for
    multi-day frequencies).
    """
    unit, _ = parse_freq(freq)
    if unit in ("month", "year"):
        return F.date_trunc(unit, F.col(ts_col))
    _, secs = parse_freq(freq)
    if secs in (1, 60, 3600, 86400, 604800):
        name = {1: "second", 60: "minute", 3600: "hour", 86400: "day", 604800: "week"}[secs]
        if name != "week":  # date_trunc('week') is ISO-Monday, not epoch-aligned
            return F.date_trunc(name, F.col(ts_col))
    e = F.unix_timestamp(F.col(ts_col)).cast("long")
    return F.timestamp_seconds(F.floor(e / secs) * secs)


def aggregate(
    df: DataFrame,
    groupby: str,
    statistic: str | Sequence[str] = "mean",
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Downsample ``df`` to ``groupby`` frequency ('T','H','D','M','A',
    '15T','7D', … or 'all' / 'months_across_years')."""
    stats = [statistic] if isinstance(statistic, str) else list(statistic)
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    exprs: list[Column] = []
    for col in value_cols:
        for s in stats:
            exprs.extend(_stat_exprs(col, s, ts_col))

    if groupby == "all":
        # Whole-series aggregate; labeled by the final timestamp
        # (reference: index = last instant, name 'POR', aggregate.py:227-232).
        return df.groupBy(*key_cols).agg(F.max(ts_col).alias(ts_col), *exprs)
    if groupby == "months_across_years":
        # GROUP BY month-of-year → 12 rows (aggregate.py:233-235).
        return (
            df.groupBy(*key_cols, F.month(ts_col).alias("month"))
            .agg(*exprs)
            .orderBy(*key_cols, "month")
        )
    bucket = bucket_expr(ts_col, groupby).alias(ts_col)
    return df.groupBy(*key_cols, bucket).agg(*exprs)


def describe(
    df: DataFrame,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    exact_quartiles: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Summary statistics with EXACT quartiles by default (pandas
    df.describe parity; Spark's ``summary()`` uses approximate
    percentiles which would break the oracle). Ref:
    functions/describe.py:70-99.

    One aggregate pass; exact percentile buffers each group's values,
    acceptable for tiered/aggregated inputs. For raw 100 TB inputs pass
    ``exact_quartiles=False``: quartiles switch to
    ``approx_percentile`` (Greenwald-Khanna, bounded memory, rank
    error ≤ 1/``accuracy``) while count/mean/std/min/max stay exact —
    the scale profile of the same verb, not a different contract.
    """
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]

    def pct(v, q):
        if exact_quartiles:
            return F.percentile(v, F.lit(q))
        return F.percentile_approx(v, F.lit(q), F.lit(accuracy))

    exprs = []
    for c in value_cols:
        v = F.col(c)
        exprs += [
            F.count(v).alias(f"{c}_count"),
            F.avg(v).alias(f"{c}_mean"),
            F.stddev_samp(v).alias(f"{c}_std"),
            F.min(v).alias(f"{c}_min"),
            pct(v, 0.25).alias(f"{c}_25"),
            pct(v, 0.5).alias(f"{c}_50"),
            pct(v, 0.75).alias(f"{c}_75"),
            F.max(v).alias(f"{c}_max"),
        ]
    return df.groupBy(*key_cols).agg(*exprs)


def time_weighted_avg(
    df: DataFrame,
    freq: str,
    method: str = "linear",
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Time-weighted average per (keys, bucket) over IRREGULARLY
    sampled data — the TimescaleDB ``time_weight`` semantics (public
    docs): integrate the interpolant between consecutive samples
    inside the bucket and divide by the covered duration (first
    sample → last sample; no extrapolation across bucket edges).
    ``method='linear'`` uses the trapezoid (gauges), ``'locf'`` holds
    the earlier value (counters/steps). A bucket whose samples span
    zero time (single sample, or all samples at one instant) falls
    back to the plain mean of its values.

    Scale shape: one window pass partitioned by (keys, bucket) for the
    lead pair, then one groupBy with map-side partial aggregation —
    pairs never cross buckets, so both the sort and the aggregate key
    on the same composite and the data shuffles once. Per-pair areas
    are fixed to DECIMAL(38,6) before the cross-row sum so the total
    is independent of partial-merge order (the repo-wide determinism
    rule for double sums); the duration denominator stays in exact
    long microseconds.

    Ties in ``ts`` are ordered by value (documented, mirrored by the
    oracle) so the trapezoid pairing is deterministic; zero-width
    pairs contribute zero area either way.
    """
    if method not in ("linear", "locf"):
        raise ValueError(f"method must be 'linear' or 'locf', got {method!r}")
    keys = list(key_cols)
    v = F.col(value_col).cast("double")
    nn = df.filter(v.isNotNull() & F.col(ts_col).isNotNull())
    b = bucket_expr(ts_col, freq).alias("__bucket")
    base = nn.select(*keys, b, F.col(ts_col).alias("__ts"), v.alias("__v"))
    # cast: parquet NTZ timestamps; session TZ is pinned UTC so this
    # is a pure type adjustment
    mic = F.unix_micros(F.col("__ts").cast("timestamp"))
    w = Window.partitionBy(*keys, "__bucket").orderBy(mic, F.col("__v"))
    paired = base.select(
        *keys,
        "__bucket",
        "__v",
        (F.unix_micros(F.lead(F.col("__ts").cast("timestamp"), 1).over(w)) - mic)
        .alias("__dt_us"),
        F.lead("__v", 1).over(w).alias("__lv"),
    )
    height = (
        (F.col("__v") + F.col("__lv")) / 2.0 if method == "linear" else F.col("__v")
    )
    area = (height * (F.col("__dt_us") / F.lit(1e6))).cast("decimal(38,6)")
    agg = paired.groupBy(*keys, "__bucket").agg(
        F.sum(area).alias("__area"),
        F.sum("__dt_us").alias("__dt"),
        F.sum(F.col("__v").cast("decimal(28,2)")).alias("__vsum"),
        F.count("__v").alias("__cnt"),
    )
    twa = F.when(
        F.col("__dt") > 0,
        F.col("__area").cast("double") / (F.col("__dt") / F.lit(1e6)),
    ).otherwise(F.col("__vsum").cast("double") / F.col("__cnt"))
    return agg.select(
        *keys,
        F.col("__bucket").alias(ts_col),
        # engine-identical 6-dp rounding (floor(x*1e6+0.5)/1e6)
        (F.floor(twa * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            f"{value_col}_twa"
        ),
    )


def weighted_mean(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    tier: str = "1d",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Weight-weighted mean per (key, tier bucket) — the VWAP shape
    (sum(v·w)/sum(w)). Each v·w product is computed in double, then
    ROUNDED HALF_UP to 1e-6 (decimal cast semantics) so the
    DECIMAL(38,6) sums are associative and partitioning-independent;
    the final division is one double op. Products needing more than 6
    decimals lose the excess to that rounding — for sub-1e-3
    magnitudes, rescale the value column first. ``n`` counts rows
    where BOTH value and weight are non-null (a null-weight row
    contributes nothing to either sum and must not inflate n). Plain
    map-side-combinable groupBy — no window, no join. Caveat: under
    non-ANSI mode a DECIMAL(38,6) sum that overflows returns NULL
    rather than raising; 38 digits leave ~10^32 headroom over 1e-6
    quanta, far beyond any 100 TB corpus sum.
    """
    from ..pipeline.rollup import TIERS

    unit = TIERS[tier]
    vw = (F.col(value_col) * F.col(weight_col)).cast("decimal(38,6)")
    # a row with a null value must not contribute its weight to the
    # denominator either — only fully observed rows enter the mean
    w = F.when(
        F.col(value_col).isNotNull(), F.col(weight_col)
    ).cast("decimal(38,6)")
    both = F.when(
        F.col(value_col).isNotNull() & F.col(weight_col).isNotNull(),
        F.lit(1),
    )
    out = df.groupBy(
        *key_cols, F.date_trunc(unit, F.col(ts_col)).alias("ts")
    ).agg(
        F.sum(vw).alias("__svw"),
        F.sum(w).alias("__sw"),
        F.count(both).alias("n"),
    )
    return out.select(
        *key_cols,
        "ts",
        (
            F.col("__svw").cast("double") / F.col("__sw").cast("double")
        ).alias("weighted_mean"),
        F.col("__sw").cast("double").alias("weight_sum"),
        "n",
    )
