"""Reshape / set ops: stack, unstack, merge (rows/columns/combine),
createts.

Reference semantics:
- stack: /root/reference/tstoolbox/functions/stack.py:125-131
  (wide → (Datetime, Columns, Values) long form)
- unstack: functions/unstack.py:124-129 (long → wide via
  pivot_table(aggfunc='first'); duplicate (ts,label) is an error)
- read --append rows|columns|combine: functions/read.py:160-171
- createts: functions/createts.py:110

Scale notes: ``stack`` is a generate (no shuffle); ``unstack`` pivots
with an explicit label list when provided — pass it at scale to skip
the distinct-scan Spark otherwise needs. ``merge_columns`` is a
full-outer join on (key, ts) — co-partitioned by the join key;
``merge_combine`` is the same join + COALESCE priority.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import parse_freq


def stack(
    df: DataFrame,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    label_col: str = "Columns",
    value_out: str = "Values",
) -> DataFrame:
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    ids = [ts_col, *key_cols]
    return df.unpivot(
        ids, list(value_cols), variableColumnName=label_col, valueColumnName=value_out
    )


def unstack(
    df: DataFrame,
    label_col: str = "Columns",
    value_col: str = "Values",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    labels: Sequence[str] | None = None,
) -> DataFrame:
    pivot = df.groupBy(ts_col, *key_cols).pivot(
        label_col, list(labels) if labels else None
    )
    return pivot.agg(F.first(value_col))


def merge_rows(frames: Sequence[DataFrame]) -> DataFrame:
    """append='rows': UNION ALL by column name. Ref: read.py:171."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def merge_columns(
    frames: Sequence[DataFrame], ts_col: str = "ts", key_cols: Sequence[str] = ()
) -> DataFrame:
    """append='columns': align on the union of timestamps (full-outer
    join). Ref: read.py:160-167. Columns must be disjoint apart from
    the join key."""
    on = [ts_col, *key_cols]
    out = frames[0]
    for f in frames[1:]:
        out = out.join(f, on=on, how="full")
    return out


def merge_combine(
    frames: Sequence[DataFrame], ts_col: str = "ts", key_cols: Sequence[str] = ()
) -> DataFrame:
    """append='combine': combine_first priority merge — earlier frames
    win, later frames fill their nulls (COALESCE per shared column).
    Ref: read.py:168."""
    on = [ts_col, *key_cols]
    out = frames[0]
    for i, f in enumerate(frames[1:], 1):
        shared = [c for c in out.columns if c in f.columns and c not in on]
        f_ren = f
        for c in shared:
            f_ren = f_ren.withColumnRenamed(c, f"__r{i}_{c}")
        out = out.join(f_ren, on=on, how="full")
        for c in shared:
            out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__r{i}_{c}"))).drop(
                f"__r{i}_{c}"
            )
    return out


def createts(
    spark: SparkSession,
    start_date: str,
    end_date: str,
    freq: str = "D",
    ts_col: str = "ts",
) -> DataFrame:
    """Generate an empty regular series. Ref: createts.py:110.
    ``sequence+explode`` — generated distributed, never collected."""
    _, secs = parse_freq(freq)
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(start_date)),
                F.to_timestamp(F.lit(end_date)),
                F.expr(f"INTERVAL {secs} SECOND"),
            )
        ).alias(ts_col)
    )
