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

from pyspark.sql import Column, DataFrame
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
