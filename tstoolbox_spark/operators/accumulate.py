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
