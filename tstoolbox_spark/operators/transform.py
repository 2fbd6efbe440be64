"""Value/index transforms: clip, replace, convert (affine),
normalization, converttz, date_offset, convert_index.

Reference semantics:
- clip: /root/reference/tstoolbox/functions/clip.py:118-142
- replace: functions/replace.py:126
- convert: functions/convert.py:125 (v*factor + offset)
- normalization: functions/normalization.py:148-216
  (minmax :191-194, zscore :196, pct_rank :198)
- converttz: functions/converttz.py:120
- date_offset: functions/date_offset.py:119
- convert_index: functions/convert_index.py:191-356 (julian/unix epochs)

All are narrow column expressions except normalization, whose global
per-key statistics are window-over-key aggregates (one shuffle; at
scale these keys are the bucketed series, so partitions stay bounded).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .core import epoch_seconds

#: epoch name → offset in days relative to julian day 0 (reference
#: table: functions/convert_index.py:234-247, epoch dates :263-276)
EPOCH_JULIAN_OFFSET = {
    "julian": 0.0,
    "reduced": 2400000.0,
    "modified": 2400000.5,
    "truncated": 2440000.5,
    "dublin": 2415020.0,
    "cnes": 2433282.5,
    "ccsds": 2436204.5,
    "lop": 2448622.5,
    "lilian": 2299159.5,
    "rata_die": 1721424.5,
    "mars_sol": 2405522.0,
    "unix": 2440587.5,
}


def clip(
    df: DataFrame,
    a_min: float | None = None,
    a_max: float | None = None,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    out = df
    for c in value_cols:
        v = F.col(c)
        if a_min is not None:
            v = F.greatest(v, F.lit(float(a_min)))
        if a_max is not None:
            v = F.least(v, F.lit(float(a_max)))
        out = out.withColumn(f"{c}_clip", v)
    return out


def replace(
    df: DataFrame,
    from_values: Sequence[float],
    to_values: Sequence[float],
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    if len(from_values) != len(to_values):
        raise ValueError("from_values and to_values must have equal length")
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    out = df
    for c in value_cols:
        expr = F.col(c)
        for f_v, t_v in zip(from_values, to_values):
            expr = F.when(F.col(c) == F.lit(f_v), F.lit(t_v)).otherwise(expr)
        out = out.withColumn(c, expr)
    return out


def convert(
    df: DataFrame,
    factor: float = 1.0,
    offset: float = 0.0,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    out = df
    for c in value_cols:
        out = out.withColumn(
            f"{c}_convert", F.col(c) * F.lit(float(factor)) + F.lit(float(offset))
        )
    return out


def normalization(
    df: DataFrame,
    mode: str = "minmax",
    min_limit: float = 0.0,
    max_limit: float = 1.0,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """minmax / zscore / pct_rank / maxabs / robust rescaling.

    Scale shape: per-key statistics come from a map-side-combinable
    ``groupBy().agg()`` broadcast-joined back onto the rows — NOT a
    ``Window.partitionBy(key)``, which would funnel every row of a
    low-cardinality key through one task at corpus scale. (pct_rank is
    the exception: a rank is inherently a per-key sort.)
    """
    if isinstance(value_cols, str):
        value_cols = [value_cols]
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    keys = list(key_cols)
    out = df

    if mode == "pct_rank":
        # percent_rank == (min_rank - 1) / (n - 1); computed from
        # per-(key, value) rank components (range-partitioned parallel
        # row numbers + equi-join back) instead of a one-task-per-key
        # Window.partitionBy(low-card key).orderBy(value) sort.
        from .stats import rank_components

        for c in value_cols:
            comps = rank_components(out, c, keys)
            expr = (F.col("__mn") - 1).cast("double") / (F.col("__n") - 1)
            comps = comps.select(*keys, c, expr.alias(f"{c}_{mode}"))
            out = out.join(comps, [*keys, c], "left")
        return out

    aggs: list[Column] = []
    for c in value_cols:
        v = F.col(c)
        if mode == "minmax":
            aggs += [F.min(v).alias(f"__lo_{c}"), F.max(v).alias(f"__hi_{c}")]
        elif mode == "zscore":
            aggs += [F.avg(v).alias(f"__mu_{c}"), F.stddev_samp(v).alias(f"__sd_{c}")]
        elif mode == "maxabs":
            aggs += [F.max(F.abs(v)).alias(f"__ma_{c}")]
        elif mode == "robust":
            aggs += [
                F.percentile(v, F.lit(0.25)).alias(f"__q1_{c}"),
                F.percentile(v, F.lit(0.5)).alias(f"__q2_{c}"),
                F.percentile(v, F.lit(0.75)).alias(f"__q3_{c}"),
            ]
        else:
            raise ValueError(f"unknown normalization mode {mode!r}")
    stats = df.groupBy(*keys).agg(*aggs)
    out = (
        df.join(F.broadcast(stats), on=keys, how="left")
        if keys
        else df.crossJoin(F.broadcast(stats))
    )
    for c in value_cols:
        v = F.col(c)
        name = f"{c}_{mode}"
        if mode == "minmax":
            lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
            expr = F.lit(min_limit) + (v - lo) / (hi - lo) * F.lit(max_limit - min_limit)
        elif mode == "zscore":
            expr = (v - F.col(f"__mu_{c}")) / F.col(f"__sd_{c}")
        elif mode == "maxabs":
            expr = v / F.col(f"__ma_{c}")
        else:  # robust
            expr = (v - F.col(f"__q2_{c}")) / (F.col(f"__q3_{c}") - F.col(f"__q1_{c}"))
        out = out.withColumn(name, expr)
    return out.drop(*[f.name for f in stats.schema.fields if f.name.startswith("__")])


def converttz(df: DataFrame, fromtz: str, totz: str, ts_col: str = "ts") -> DataFrame:
    """Reinterpret naive timestamps from one zone to another.
    Ref: functions/converttz.py:120. Engine canonical storage is UTC."""
    return df.withColumn(
        ts_col, F.from_utc_timestamp(F.to_utc_timestamp(F.col(ts_col), fromtz), totz)
    )


def date_offset(df: DataFrame, intervals: int, unit: str, ts_col: str = "ts") -> DataFrame:
    """Shift every timestamp by intervals×unit. Ref: functions/date_offset.py:119."""
    return df.withColumn(ts_col, F.col(ts_col) + F.expr(f"INTERVAL {intervals} {unit}"))


def convert_index_to_number(
    df: DataFrame, epoch: str = "julian", ts_col: str = "ts", out_col: str = "idx"
) -> DataFrame:
    """datetime → float day-number under a named epoch.
    Ref: functions/convert_index.py:326-331 (via to_julian_date)."""
    if epoch not in EPOCH_JULIAN_OFFSET:
        raise ValueError(f"unknown epoch {epoch!r}")
    julian = epoch_seconds(F.col(ts_col)) / 86400.0 + 2440587.5
    return df.withColumn(out_col, julian - F.lit(EPOCH_JULIAN_OFFSET[epoch]))


def convert_index_to_datetime(
    df: DataFrame, epoch: str = "julian", num_col: str = "idx", ts_col: str = "ts"
) -> DataFrame:
    """Inverse of convert_index_to_number. Ref: convert_index.py:335-338."""
    if epoch not in EPOCH_JULIAN_OFFSET:
        raise ValueError(f"unknown epoch {epoch!r}")
    julian = F.col(num_col) + F.lit(EPOCH_JULIAN_OFFSET[epoch])
    return df.withColumn(ts_col, F.timestamp_seconds((julian - 2440587.5) * 86400.0))


def quantile_normalize(
    df: DataFrame,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Map each value onto the standard-normal quantile of its
    mid-rank — rank-based inverse-normal ("quantile") normalization,
    the feature-prep transform that forces any marginal distribution
    to N(0,1): z = Φ⁻¹((r̄ − 0.5) / n) with r̄ the average rank among
    ties (Hazen plotting position, van der Waerden-style scores).

    Built entirely from existing scalable pieces: per-(key, value)
    rank components (range-partitioned parallel ranking — no
    single-task key sort) and the Acklam Φ⁻¹ column expression
    (stats.norm_ppf), joined back on (keys, value). Nulls pass
    through.
    """
    from .stats import norm_ppf, rank_components

    if isinstance(value_cols, str):
        value_cols = [value_cols]
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    keys = list(key_cols)
    out = df
    for c in value_cols:
        comps = rank_components(out, c, keys)
        avg_rank = (F.col("__mn") + F.col("__mx")) / 2.0
        p = (avg_rank - 0.5) / F.col("__n")
        comps = comps.select(
            *keys, c, norm_ppf(p).alias(f"{c}_qnorm")
        )
        out = out.join(comps, [*keys, c], "left")
    return out
