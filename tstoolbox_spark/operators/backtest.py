"""Rolling-origin backtest folds (time-series cross-validation).

Forecast models over time series cannot be validated with shuffled
K-fold splits — training data must strictly precede test data. The
standard scheme (Hyndman & Athanasopoulos, *Forecasting: Principles
and Practice*, "evaluation on a rolling forecasting origin") grows
the training window fold by fold and tests on the slice that follows
it. The reference has forecasting verbs (fit/gof); this gives their
evaluation protocol a distributed, deterministic shape.

Boundaries are pure integer arithmetic over epoch microseconds:

    span = tmax − tmin + 1            (half-open cover includes tmax)
    b_j  = tmin + (span · j) DIV (K+1),  j = 0..K+1
    fold k (1..K):  train = [b_0, b_k),  test = [b_k, b_{k+1})

so fold assignment is exact, engine-portable (the DuckDB oracle runs
the identical expressions), and stable under re-runs and
repartitioning. The bounds come from one tiny aggregate that joins
back as a broadcast literal row — no driver collection, no second
scan of an unpersisted plan.

Scale shape: the output is input × K rows by construction (every
fold materializes its train slice). That is the contract of fold
materialization — callers that only need counts should aggregate the
result (the driver query does), and K is small (3–10) by the nature
of backtesting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rolling_origin_folds(
    df: DataFrame,
    n_folds: int = 4,
    ts_col: str = "ts",
) -> DataFrame:
    """Tag every (row, fold) pair with its role: ``fold`` in 1..K and
    ``role`` in {'train', 'test'}. Rows after the fold's test window
    are absent from that fold (future data is unused, not 'train')."""
    if n_folds < 1:
        raise ValueError(f"n_folds must be >= 1, got {n_folds}")
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    bounds = df.agg(
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("__tmin"),
        (
            F.max(F.unix_micros(F.col(ts_col).cast("timestamp")))
            - F.min(F.unix_micros(F.col(ts_col).cast("timestamp")))
            + F.lit(1)
        ).alias("__span"),
    )
    folds = df.sparkSession.range(1, n_folds + 1).select(
        F.col("id").cast("int").alias("fold")
    )
    parts = n_folds + 1
    cut = F.col("__tmin") + F.expr(
        f"(__span * fold) DIV {parts}"
    )
    nxt = F.col("__tmin") + F.expr(
        f"(__span * (fold + 1)) DIV {parts}"
    )
    role = (
        F.when(t < cut, F.lit("train"))
        .when((t >= cut) & (t < nxt), F.lit("test"))
    )
    return (
        df.join(F.broadcast(bounds))
        .join(F.broadcast(folds))
        .withColumn("role", role)
        .filter(F.col("role").isNotNull())
        .drop("__tmin", "__span")
    )
