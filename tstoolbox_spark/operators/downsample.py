"""Visualization-grade downsampling.

``m4_downsample`` implements M4 (Jugel et al., VLDB 2014, "M4: A
Visualization-Oriented Time Series Data Aggregation"): per time
bucket (one bucket per output pixel column) keep only the rows
carrying the bucket's min value, max value, first timestamp and last
timestamp — the four extrema that make the downsampled line render
pixel-identically to the full-resolution line.

Scale shape: ONE groupBy on (keys, bucket) with four struct
min/max aggregates — map-side partial aggregation collapses each
input partition to <=4 rows per bucket before the shuffle, so the
shuffle volume is O(buckets), not O(rows). No window, no sort of the
raw data, no UDF; a 100 TB series downsamples to a 4*pixels-row
frame in a single pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstoolbox_spark.operators.aggregate import bucket_expr


def m4_downsample(
    df: DataFrame,
    freq: str,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """M4 downsample to ``freq`` buckets ('H', '15T', '1D', ...).

    Emits the distinct union of the four role rows per (keys, bucket):
    min-value (earliest ts on value ties), max-value (latest ts on
    value ties), first-ts, last-ts. A physical row holding several
    roles appears once. Output: key_cols + (bucket, ts, value),
    ordered for stable comparison.
    """
    v = F.col(value_col).cast("double")
    t = F.col(ts_col)
    # null values would poison the struct min/max ordering (null fields
    # sort first) — M4 renders only observed points, so drop them
    df = df.filter(v.isNotNull() & t.isNotNull())
    g = df.groupBy(*key_cols, bucket_expr(ts_col, freq).alias("bucket")).agg(
        F.min(F.struct(v.alias("v"), t.alias("t"))).alias("vmin"),
        F.max(F.struct(v.alias("v"), t.alias("t"))).alias("vmax"),
        F.min(F.struct(t.alias("t"), v.alias("v"))).alias("tfirst"),
        F.max(F.struct(t.alias("t"), v.alias("v"))).alias("tlast"),
    )
    pts = g.select(
        *key_cols,
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.struct(F.col("vmin.t").alias("t"), F.col("vmin.v").alias("v")),
                    F.struct(F.col("vmax.t").alias("t"), F.col("vmax.v").alias("v")),
                    F.struct(F.col("tfirst.t").alias("t"), F.col("tfirst.v").alias("v")),
                    F.struct(F.col("tlast.t").alias("t"), F.col("tlast.v").alias("v")),
                )
            )
        ).alias("p"),
    )
    return (
        pts.select(
            *key_cols,
            "bucket",
            F.col("p.t").alias(ts_col),
            F.col("p.v").alias(value_col),
        )
        .orderBy(*key_cols, "bucket", ts_col, value_col)
    )
