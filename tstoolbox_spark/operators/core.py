"""Shared input-pipeline stages: pick / date_slice / clean / round_index /
dropna / regularize (asbestfreq analog).

Reference: the ``common_kwds`` pipeline applied by every verb
(/root/reference/tstoolbox/tsutils.py:1164-1224). Order there is
pick -> clean -> round_index -> asbestfreq -> date_slice -> dropna;
``apply_common`` preserves that order.

All stages are narrow column expressions except ``clean`` (one shuffle
on the series key — unavoidable for a distributed dedup) and
``regularize`` (grid join; the grid side is generated, not scanned).
Filters here are plain Catalyst predicates, so date_slice pushes down
to the parquet/Iceberg scan as ts min/max row-group pruning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Interval name → seconds. Engine tiers are fixed-length intervals;
# calendar intervals (month/year) are handled by date_trunc directly.
INTERVAL_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}

# pandas offset aliases → (interval unit, multiple)
PANDAS_FREQ = {
    "S": ("second", 1),
    "T": ("minute", 1),
    "min": ("minute", 1),
    "H": ("hour", 1),
    "h": ("hour", 1),
    "D": ("day", 1),
    "W": ("week", 1),
    "M": ("month", 1),
    "ME": ("month", 1),
    "A": ("year", 1),
    "Y": ("year", 1),
    "YE": ("year", 1),
}


def parse_freq(freq: str) -> tuple[str, int]:
    """Parse a pandas-style offset alias ('H', 'D', '15T', '7D', 'M')
    into (unit, total_seconds). For calendar units (month/year) the
    second element is the multiple instead — callers that need fixed
    grids reject those units."""
    i = 0
    while i < len(freq) and freq[i].isdigit():
        i += 1
    mult = int(freq[:i]) if i else 1
    code = freq[i:]
    if code not in PANDAS_FREQ:
        raise ValueError(f"unsupported frequency code {code!r} (from {freq!r})")
    unit, base = PANDAS_FREQ[code]
    if unit in ("month", "year"):
        return unit, mult * base
    return unit, mult * base * INTERVAL_SECONDS[unit]


def epoch_micros(col: F.Column) -> F.Column:
    """NTZ-safe epoch microseconds (parquet timestamps read as
    TIMESTAMP_NTZ; session TZ is pinned UTC so the cast is identity)."""
    return F.unix_micros(col.cast("timestamp"))


def epoch_seconds(col: F.Column) -> F.Column:
    """NTZ-safe fractional epoch seconds."""
    return epoch_micros(col).cast("double") / 1e6


def pick(df: DataFrame, columns: Sequence[str], keep: Sequence[str] = ("ts",)) -> DataFrame:
    """Column projection. Ref: tsutils.py:1227-1301 (_pick)."""
    keep = [c for c in keep if c in df.columns and c not in columns]
    return df.select(*keep, *columns)


def date_slice(
    df: DataFrame,
    start: str | None = None,
    end: str | None = None,
    ts_col: str = "ts",
    insert_boundaries: bool = False,
) -> DataFrame:
    """Inclusive [start, end] row slice. Ref: tsutils.py:1304-1327,
    functions/date_slice.py:77-104.

    Pure predicate → pushed down to the scan (PushedFilters on ts).

    ``insert_boundaries=True`` reproduces the reference quirk
    (tsutils.py:1317-1323): a boundary timestamp absent from the data
    is first inserted as an all-null row, so slice outputs always
    contain both endpoints. Default off — regularized tier outputs
    already contain boundary instants; enable only for bit-for-bit
    parity with the reference CLI.
    """
    out = df
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.to_timestamp(F.lit(start)))
    if end is not None:
        out = out.filter(F.col(ts_col) <= F.to_timestamp(F.lit(end)))
    if insert_boundaries:
        spark = df.sparkSession
        for bound in (start, end):
            if bound is None:
                continue
            row = spark.range(1).select(
                F.to_timestamp(F.lit(bound)).alias(ts_col),
                *[
                    F.lit(None).cast(df.schema[c].dataType).alias(c)
                    for c in df.columns
                    if c != ts_col
                ],
            ).select(*df.columns)
            # left-anti on ts: insert only when the instant is absent
            missing = row.join(out.select(ts_col), ts_col, "left_anti")
            out = out.unionByName(missing)
    return out


def clean(df: DataFrame, ts_col: str = "ts", key_cols: Sequence[str] = ()) -> DataFrame:
    """Sort + drop duplicate timestamps keeping the first occurrence.
    Ref: tsutils.py:1197-1199 (clean=True).

    One shuffle on (key, ts). 'First' means first in the frame's
    original order; with no stable input order in a distributed table
    we keep the minimum of a deterministic tiebreaker so results are
    reproducible run-to-run.
    """
    order = [F.col(c) for c in df.columns if c != ts_col and c not in key_cols]
    w = Window.partitionBy(*key_cols, ts_col).orderBy(*order) if order else Window.partitionBy(
        *key_cols, ts_col
    ).orderBy(ts_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def round_index(
    df: DataFrame, freq: str, ts_col: str = "ts", mode: str = "round"
) -> DataFrame:
    """Round timestamps to the nearest/floor/ceiling interval.
    Ref: tsutils.py:677-682 (_round_index).

    Column expression on epoch seconds — no shuffle.
    """
    unit, secs = parse_freq(freq)
    if unit in ("month", "year"):
        if mode != "floor":
            raise ValueError("calendar intervals support only floor (date_trunc)")
        return df.withColumn(ts_col, F.date_trunc(unit, F.col(ts_col)))
    e = F.floor(epoch_seconds(F.col(ts_col))).cast("long")
    if mode == "round":
        bucket = F.floor((e + secs // 2) / secs) * secs
    elif mode == "floor":
        bucket = F.floor(e / secs) * secs
    elif mode == "ceiling":
        bucket = F.ceil(e / secs) * secs
    else:
        raise ValueError(f"unknown rounding mode {mode!r}")
    return df.withColumn(ts_col, F.timestamp_seconds(bucket))


def dropna(
    df: DataFrame, how: str = "any", value_cols: Sequence[str] | None = None
) -> DataFrame:
    """Drop rows with nulls in any/all value columns. Ref: tsutils.py:1211-1217."""
    if how == "no":
        return df
    return df.na.drop(how=how, subset=list(value_cols) if value_cols else None)


def infer_freq(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> str:
    """Infer the best fixed frequency (asbestfreq's minimum-interval /
    GCD technique, ref tsutils.py:1349-1473 step 6) WITHOUT sorting:
    the grid step of a regular-with-gaps series equals
    gcd(ts_i - min(ts)) over all rows, so one map-side-combinable
    per-key min, a broadcast join, and a per-Arrow-batch
    ``np.gcd.reduce`` (one long per batch collected) find it in a
    single pass at any scale — no per-key sort, no lag window.

    Returns a pandas-style offset string ('3600S' granular forms are
    normalized to W/D/H/T/S multiples). Raises if the GCD lands below
    one second (sub-second or irregular data).
    """
    import numpy as np
    import pandas as pd
    from math import gcd

    keys = list(key_cols)
    anchors = df.groupBy(*keys).agg(F.min(ts_col).alias("__t0"))
    joined = (
        df.join(F.broadcast(anchors), on=keys)
        if keys
        else df.crossJoin(F.broadcast(anchors))
    )
    diffs = joined.select(
        (epoch_micros(F.col(ts_col)) - epoch_micros(F.col("__t0"))).alias("d")
    )

    def _batch_gcd(it):
        for pdf in it:
            v = pdf["d"].to_numpy(dtype=np.int64)
            yield pd.DataFrame({"g": [int(np.gcd.reduce(v)) if v.size else 0]})

    parts = diffs.mapInPandas(_batch_gcd, schema="g long").collect()
    g = 0
    for r in parts:
        g = gcd(g, int(r["g"]))
    if g == 0:
        raise ValueError("infer_freq: all timestamps identical; no grid to infer")
    if g % 1_000_000:
        raise ValueError(
            f"infer_freq: inferred step {g} microseconds is sub-second/irregular; "
            "round_index or clean the series first"
        )
    secs = g // 1_000_000
    for unit_secs, code in ((604800, "W"), (86400, "D"), (3600, "H"), (60, "T")):
        if secs % unit_secs == 0:
            mult = secs // unit_secs
            return f"{mult}{code}" if mult != 1 else code
    return f"{secs}S"


def regularize(
    df: DataFrame,
    freq: str | None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """asbestfreq analog: snap the series onto a fixed grid, materializing
    null rows for gaps. Ref: tsutils.py:1349-1473 (asfreq at 1469-1473).

    Grid synthesis = per-key [min_ts, max_ts] aggregate →
    ``explode(sequence(...))`` → left join values back. The grid side
    is computed, never scanned, and the join key is (key, ts) so it
    co-partitions with the value side. The per-key extent aggregate is
    a map-side-combinable min/max — cheap at any scale.

    Assumes timestamps are already interval-aligned (run round_index
    first for dirty inputs); off-grid rows would not join and are
    dropped, matching the reference's error-or-clean contract.

    ``freq=None`` infers the grid step first (asbestfreq's GCD
    technique — see :func:`infer_freq`).
    """
    if freq is None:
        freq = infer_freq(df, ts_col, key_cols)
    unit, secs = parse_freq(freq)
    if unit in ("month", "year"):
        raise ValueError("regularize supports fixed-length intervals only")
    keys = list(key_cols)
    if start is not None and end is not None:
        bounds = (
            df.select(*keys).distinct()
            if keys
            else df.sparkSession.range(1).select()
        )
        bounds = bounds.withColumn("__min_ts", F.to_timestamp(F.lit(start))).withColumn(
            "__max_ts", F.to_timestamp(F.lit(end))
        )
    else:
        bounds = df.groupBy(*keys).agg(
            F.min(ts_col).alias("__min_ts"), F.max(ts_col).alias("__max_ts")
        )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("__min_ts"),
                F.col("__max_ts"),
                F.expr(f"INTERVAL {secs} SECOND"),
            )
        ).alias(ts_col),
    )
    return grid.join(df, on=keys + [ts_col], how="left")


def upsample_linear(
    df: DataFrame,
    step_seconds: int,
    value_cols: Sequence[str],
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Upsample to a finer fixed grid with linear interpolation between
    consecutive observations (the reference's asbestfreq +
    fill method='linear' composition, ref tsutils.py:1349-1473 +
    fill.py interpolate — fused into one pass, no gap-join needed when
    the TARGET grid subdivides the source spacing).

    Shape: ONE window sort (lead of ts and each value col per key),
    then an ``explode(sequence(...))`` that synthesizes the
    intermediate grid points arithmetically — rows out =
    rows in x (gap/step); nothing is scanned twice and nothing
    shuffles beyond the window sort. Works on irregular input too:
    each gap is subdivided independently, interpolating by actual
    elapsed time. The final observation of each key is emitted as-is.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    out = df.withColumn("__nxt_ts", F.lead(ts_col).over(w))
    for c in value_cols:
        out = out.withColumn(f"__nxt_{c}", F.lead(c).over(w))
    gap = epoch_seconds(F.col("__nxt_ts")) - epoch_seconds(F.col(ts_col))
    n_steps = F.when(
        F.col("__nxt_ts").isNull(), F.lit(1)
    ).otherwise(F.greatest((gap / step_seconds).cast("long"), F.lit(1)))
    out = out.withColumn(
        "__q", F.explode(F.sequence(F.lit(0), (n_steps - 1).cast("int")))
    )
    frac = (F.col("__q") * step_seconds) / gap
    cols = [
        *keys,
        F.timestamp_add(
            "SECOND", F.col("__q") * step_seconds, F.col(ts_col)
        ).alias(ts_col),
    ]
    for c in value_cols:
        interp = F.col(c) + (F.col(f"__nxt_{c}") - F.col(c)) * frac
        cols.append(
            F.when(F.col("__q") == 0, F.col(c)).otherwise(interp).alias(c)
        )
    return out.select(*cols)


def apply_common(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    columns: Sequence[str] | None = None,
    do_clean: bool = False,
    round_freq: str | None = None,
    freq: str | None = None,
    start: str | None = None,
    end: str | None = None,
    drop: str = "no",
) -> DataFrame:
    """The common preprocessing pipeline in the reference's fixed order
    (tsutils.py:1164-1224)."""
    out = df
    if columns:
        out = pick(out, columns, keep=[ts_col, *key_cols])
    if do_clean:
        out = clean(out, ts_col, key_cols)
    if round_freq:
        out = round_index(out, round_freq, ts_col)
    if freq:
        out = regularize(out, freq, ts_col, key_cols)
    out = date_slice(out, start, end, ts_col)
    return dropna(out, drop, value_cols)


def null_profile(
    df: DataFrame,
    value_cols: Sequence[str] | None = None,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Long-form null-density report per key: one row per (key,
    column) with the null fraction and counts — the standard
    data-quality read after regularization (gap rows carry nulls) or
    ingest. One map-combinable aggregate; the unpivot touches only
    the tiny aggregated frame.
    """
    if isinstance(value_cols, str):
        value_cols = [value_cols]
    if value_cols is None:
        skip = set(key_cols)
        value_cols = [c for c in df.columns if c not in skip]
    keys = list(key_cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in value_cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}")
        )
    g = df.groupBy(*keys).agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{c}").alias("n_null"),
            )
            for c in value_cols
        ]
    )
    return g.select(*keys, F.col("__n").alias("n"), F.explode(structs).alias("p")).select(
        *keys,
        F.col("p.column").alias("column"),
        F.col("p.n_null").alias("n_null"),
        "n",
        (F.col("p.n_null").cast("double") / F.col("n")).alias("null_frac"),
    )
