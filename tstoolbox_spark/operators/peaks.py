"""``peak_detection`` — mark relative extrema.

Reference: /root/reference/tstoolbox/functions/peak_detection.py —
method='rel' (argrelextrema-style, :17-73): a point is a peak iff it
is strictly greater than ALL points within ±window rows; valleys
symmetric. Output keeps the input shape with non-extrema nulled
(:992-1006).

Spark mapping: window max/min over the ±k row frame, excluding the
current row by comparing against the max of (before-frame, after-frame)
— two frames per extremum kind, all sharing the one (key, ts) sort.
Curve-fit methods (parabola/sine) are out of rollup scope (SURVEY §7.5
adjacent); 'minmax' reduces to rel with window=1.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def peak_detection(
    df: DataFrame,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    window: int = 1,
    peaks: bool = True,
    valleys: bool = False,
) -> DataFrame:
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    base = Window.partitionBy(*key_cols).orderBy(ts_col)
    before = base.rowsBetween(-window, -1)
    after = base.rowsBetween(1, window)
    out = df
    for c in value_cols:
        v = F.col(c)
        # Empty neighbor frame → null max/min → comparison null → not an
        # extremum. Matches argrelextrema's boundary exclusion (a strict
        # self-comparison under mode='clip' is always false).
        if peaks:
            cond = (v > F.max(v).over(before)) & (v > F.max(v).over(after))
            out = out.withColumn(f"{c}_peak", F.when(cond, v))
        if valleys:
            cond = (v < F.min(v).over(before)) & (v < F.min(v).over(after))
            out = out.withColumn(f"{c}_valley", F.when(cond, v))
    return out
