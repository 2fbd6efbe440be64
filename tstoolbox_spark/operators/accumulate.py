"""``accumulate`` — running cumsum/cummax/cummin/cumprod per column.

Reference: /root/reference/tstoolbox/functions/accumulate.py:88-125
(dispatches ``tsd.cum<stat>()``). pandas cum* skips NaN (result at a
NaN row stays NaN but the accumulator carries through) — reproduced by
the null-pass-through ``when`` below.

Spark mapping: unbounded-preceding window aggregates — single (key,ts)
sort shared by all columns. cumprod has no native window aggregate;
``product`` exists as an aggregate function (Spark 3.2+) and is
window-able, preserving sign/zero exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATS = ("sum", "max", "min", "prod")


def accumulate(
    df: DataFrame,
    statistic: str | Sequence[str] = "sum",
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    stats = [statistic] if isinstance(statistic, str) else list(statistic)
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    frame = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fns = {"sum": F.sum, "max": F.max, "min": F.min, "prod": F.product}
    out = df
    for c in value_cols:
        v = F.col(c)
        for s in stats:
            if s not in fns:
                raise ValueError(f"unknown accumulate statistic {s!r}; choose from {STATS}")
            out = out.withColumn(
                f"{c}_cum{s}", F.when(v.isNotNull(), fns[s](v).over(frame))
            )
    return out


def integrate(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    unit_seconds: float = 3600.0,
) -> DataFrame:
    """Cumulative trapezoidal integral per key over an IRREGULAR time
    axis (the TimescaleDB ``integral`` / sensor "total energy from a
    power series" verb; the reference's equation verb cannot express
    it because it needs the time deltas):

        I(t_k) = Σ_{i≤k} (x_i + x_{i−1})/2 · Δt_i / unit_seconds

    ``unit_seconds`` converts the time axis (3600 → value·hours).
    One (key, ts) window sort shared by the lag and the running sum;
    the running sum accumulates in frame order on any engine, so the
    float association order is fixed and the result is engine-exact.
    Null values break the trapezoid (that interval contributes 0) —
    gap-fill first if other semantics are wanted. Output adds
    ``<value_col>_integral``; the first row of each key is 0.
    """
    keys = list(key_cols)
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))).orderBy(
        ts_col
    )
    x = F.col(value_col).cast("double")
    xp = F.lag(x).over(w)
    dt = (
        F.unix_micros(F.col(ts_col)) - F.lag(F.unix_micros(F.col(ts_col))).over(w)
    ).cast("double") / F.lit(1e6)
    term = F.when(
        xp.isNotNull() & x.isNotNull(),
        (x + xp) / F.lit(2.0) * dt / F.lit(float(unit_seconds)),
    ).otherwise(F.lit(0.0))
    # quantize each trapezoid to 1e-6 BEFORE the running sum: integer
    # addition is associative, so the cumulative value is identical no
    # matter how an engine's window aggregation associates (Spark
    # accumulates left-to-right, DuckDB uses a segment tree).
    term_q6 = F.floor(term * F.lit(1e6) + F.lit(0.5))
    run = F.sum(term_q6).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        f"{value_col}_integral", run.cast("double") / F.lit(1e6)
    )
