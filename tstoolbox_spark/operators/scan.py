"""Linear-recurrence scans: Holt exponential smoothing + the generic
distributed affine scan that makes such recurrences 100-TB-viable.

A first-order linear recurrence  s_t = A·s_{t-1} + u_t  (A a constant
k×k matrix, u_t a per-row input vector) covers Holt level/trend
smoothing, EWM variants, and IIR filter states. It looks inherently
sequential, but affine maps COMPOSE:  s_j→t = P·s_j + q  for a
constant P = A^(t-j) and a locally computable q — so the classic
two-pass parallel-scan applies (Blelloch 1990, public):

  pass A: each range partition scans its own rows from the zero state
          → (local final state, row count), collected at metadata
          scale (keys × partitions rows);
  driver: compose partition boundaries in order:
          s_before(p) = A^n(p-1)·s_before(p-1) + q(p-1);
  pass B: each partition re-scans from its broadcast boundary state
          and emits per-row states.

Every row is touched exactly twice, partitions run in parallel, and
the only sequential work is over the (keys × partitions) boundary
list on the driver.

Determinism note: recomposing FP affine maps reassociates the
arithmetic, so the distributed scan matches a sequential scan to
~1e-12 relative, not bit-for-bit (pytest contract). ``holt`` therefore
also ships an ``exact=True`` per-key sequential grouped-map path
(the dtw convention: keys parallelize, within-key is honest-
sequential) whose arithmetic shape is mirrored 1:1 by the DuckDB
recursive-CTE oracle.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def affine_scan(
    df: DataFrame,
    input_cols: Sequence[str],
    matrix: Sequence[Sequence[float]],
    key_cols: Sequence[str] = (),
    order_cols: Sequence[str] = ("ts",),
    state_cols: Sequence[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append per-row states of  s_t = A·s_{t-1} + u_t  (s_0 = 0)
    over rows ordered by ``order_cols`` within each key.

    ``input_cols`` name the k components of u_t; ``state_cols`` the k
    output columns (default ``s0..s{k-1}``). ``(key, order)`` tuples
    must be unique for a deterministic result.
    """
    A = np.asarray(matrix, dtype=np.float64)
    k = A.shape[0]
    if A.shape != (k, k) or len(input_cols) != k:
        raise ValueError("matrix must be k x k with k input_cols")
    outs = list(state_cols or [f"s{i}" for i in range(k)])
    keys, order = list(key_cols), list(order_cols)
    ucols = list(input_cols)

    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *[F.col(c) for c in [*keys, *order]])
    # pin partition ids once (the distributed_prefix_sum idiom): both
    # passes and the boundary collect must see the same placement
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).localCheckpoint()

    def _local(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(order)
        u = g[ucols].to_numpy(dtype=np.float64)
        s = np.zeros(k)
        for row in u:
            s = A @ s + row
        return pd.DataFrame(
            [[*[g[c].iloc[0] for c in keys], int(g["__pid"].iloc[0]), len(g),
              *[float(x) for x in s]]],
            columns=[*keys, "__pid", "__n", *[f"__q{i}" for i in range(k)]],
        )

    part_schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in keys]
        + ["__pid int", "__n long"]
        + [f"__q{i} double" for i in range(k)]
    )
    parts = (
        with_pid.groupBy(*keys, "__pid")
        .applyInPandas(_local, schema=part_schema)
        .collect()
    )

    by_key: dict[tuple, list] = {}
    for r in parts:
        by_key.setdefault(tuple(r[c] for c in keys), []).append(r)
    rows = []
    for key, lst in by_key.items():
        s = np.zeros(k)
        for r in sorted(lst, key=lambda r: r["__pid"]):
            rows.append((*key, r["__pid"], *[float(x) for x in s]))
            q = np.array([r[f"__q{i}"] for i in range(k)])
            s = np.linalg.matrix_power(A, r["__n"]) @ s + q
    off_schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in keys]
        + ["__pid int"] + [f"__b{i} double" for i in range(k)]
    )
    offsets = df.sparkSession.createDataFrame(rows, off_schema)

    joined = with_pid.join(F.broadcast(offsets), [*keys, "__pid"])
    # plain lists only below — a closure capturing df would drag the
    # SparkContext into the worker pickle (SPARK-5063)
    field_names = [f.name for f in df.schema.fields]
    out_fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    out_schema = ", ".join(out_fields + [f"{c} double" for c in outs])

    def _emit(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(order)
        u = g[ucols].to_numpy(dtype=np.float64)
        s = np.array([g[f"__b{i}"].iloc[0] for i in range(k)])
        states = np.empty((len(g), k))
        for i, row in enumerate(u):
            s = A @ s + row
            states[i] = s
        res = g[field_names].copy()
        for j, c in enumerate(outs):
            res[c] = states[:, j]
        return res

    return joined.groupBy(*keys, "__pid").applyInPandas(_emit, schema=out_schema)


def holt(
    df: DataFrame,
    alpha: float,
    beta: float,
    value_col: str = "value",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    exact: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Holt double (level + trend) exponential smoothing per key
    (textbook form, e.g. Hyndman & Athanasopoulos FPP §8.2 — public):

        l_t = α·y_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}

    init l_1 = y_1, b_1 = 0; ``fitted`` is the one-step-ahead forecast
    l_{t-1} + b_{t-1} (fitted_1 = y_1). Output: keys + (ts, value,
    level, trend, fitted).

    exact=True (default): one pandas group per key — deterministic,
    arithmetic shape mirrored exactly by the DuckDB recursive-CTE
    oracle; keys parallelize, within-key is honestly sequential.
    exact=False: route through :func:`affine_scan` (the recurrence in
    companion form — A = [[1-α, 1-α], [-αβ, 1-αβ]], u_t = [α·y_t,
    αβ·y_t], first row u_1 = [y_1, 0]) — the 100-TB path for single
    huge series; matches exact to ~1e-12 relative (FP recomposition).
    """
    if not (0.0 < alpha <= 1.0 and 0.0 <= beta <= 1.0):
        raise ValueError(f"need 0<alpha<=1, 0<=beta<=1, got {alpha}, {beta}")
    keys = list(key_cols)
    one_a, one_b = 1.0 - alpha, 1.0 - beta
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(*keys, ts_col, F.col(value_col).cast("double").alias(value_col))
    out_schema = ", ".join(
        [f"{c} {base.schema[c].dataType.simpleString()}" for c in keys]
        + [f"{ts_col} {base.schema[ts_col].dataType.simpleString()}",
           f"{value_col} double", "level double", "trend double",
           "fitted double"]
    )

    if not exact:
        w = Window.partitionBy(*keys).orderBy(ts_col)
        first = F.row_number().over(w) == 1
        y = F.col(value_col)
        prepped = base.withColumn(
            "__u0", F.when(first, y).otherwise(F.lit(alpha) * y)
        ).withColumn(
            "__u1", F.when(first, F.lit(0.0)).otherwise(F.lit(alpha * beta) * y)
        )
        A = [[one_a, one_a], [-alpha * beta, 1.0 - alpha * beta]]
        scanned = affine_scan(
            prepped, ["__u0", "__u1"], A, key_cols=keys,
            order_cols=[ts_col], state_cols=["level", "trend"],
            num_partitions=num_partitions,
        )
        lagw = Window.partitionBy(*keys).orderBy(ts_col)
        fitted = F.coalesce(
            F.lag(F.col("level") + F.col("trend"), 1).over(lagw), F.col(value_col)
        )
        return scanned.select(
            *keys, ts_col, value_col, "level", "trend", fitted.alias("fitted")
        )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(ts_col)
        y = g[value_col].to_numpy(dtype=np.float64)
        n = len(y)
        lvl = np.empty(n); trd = np.empty(n); fit = np.empty(n)
        l, b = float(y[0]), 0.0
        lvl[0], trd[0], fit[0] = l, b, float(y[0])
        for t in range(1, n):
            fit[t] = l + b
            # shape mirrored 1:1 by the recursive-CTE oracle
            l_new = alpha * float(y[t]) + one_a * (l + b)
            b = beta * (l_new - l) + one_b * b
            l = l_new
            lvl[t], trd[t] = l, b
        res = g[[*keys, ts_col, value_col]].copy()
        res["level"], res["trend"], res["fitted"] = lvl, trd, fit
        return res

    grouped = base.groupBy(*keys) if keys else base.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(_holt, schema=out_schema)


def holt_forecast(
    df: DataFrame,
    alpha: float,
    beta: float,
    horizon: int,
    step_seconds: int,
    value_col: str = "value",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """h-step-ahead Holt forecasts  ŷ_{n+h} = l_n + h·b_n  per key
    (FPP §8.2 forecast equation), h = 1..horizon at ``step_seconds``
    spacing after each key's last observation.

    Runs :func:`holt`, keeps only each key's final (level, trend)
    state — one row per key, metadata scale — and explodes the
    horizon declaratively (sequence → posexplode); the smoothing pass
    dominates, the forecast step is shuffle-free on keys already
    grouped."""
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    keys = list(key_cols)
    sm = holt(df, alpha, beta, value_col=value_col, ts_col=ts_col, key_cols=keys)
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    last = (
        sm.withColumn("__rn", F.row_number().over(w.orderBy(F.col(ts_col).desc())))
        .filter(F.col("__rn") == 1)
        .select(*keys, ts_col, "level", "trend")
    )
    h = F.posexplode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("__p", "h")
    out = last.select(*keys, ts_col, "level", "trend", h)
    step = F.col("h").cast("long") * F.lit(int(step_seconds))
    return out.select(
        *keys,
        F.timestamp_seconds(
            F.unix_timestamp(F.col(ts_col).cast("timestamp")) + step
        ).alias(ts_col),
        F.col("h").cast("int").alias("h"),
        (F.col("level") + F.col("h").cast("double") * F.col("trend")).alias("yhat"),
    )


def holt_winters(
    df: DataFrame,
    alpha: float,
    beta: float,
    gamma: float,
    season_length: int,
    value_col: str = "value",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    multiplicative: bool = False,
) -> DataFrame:
    """Holt-Winters seasonal smoothing per key (textbook form, FPP
    §8.3 — public); m = ``season_length``. Additive (default):

        fitted_t = l + b + s_old            (one-step-ahead forecast)
        l_t = α·(y_t - s_old) + (1-α)·(l + b)
        b_t = β·(l_t - l) + (1-β)·b
        s_t = γ·(y_t - l_t) + (1-γ)·s_old   (replaces the queue head)

    ``multiplicative=True`` switches to the multiplicative seasonal
    form (requires strictly positive data; seeds s_j = x_j / l_0):

        fitted_t = (l + b)·s_old
        l_t = α·(y_t / s_old) + (1-α)·(l + b)
        b_t = β·(l_t - l) + (1-β)·b
        s_t = γ·(y_t / l_t) + (1-γ)·s_old

    Seeding convention (documented, deterministic): with x_t the
    ordered series, l_0 = mean(x_1..x_m), b_0 = (mean(x_{m+1}..x_{2m})
    - l_0)/m, seasonal queue s_j = x_j - l_0 (j = 1..m, oldest first);
    the recursion then runs over ALL rows t = 1..n (backcast style).
    Seed means are computed from floor-rounded 1e-6 integer micro-units
    so the DuckDB recursive-CTE oracle sees bit-identical seeds (cross-
    engine float sum association differs; the recurrences themselves
    are identical IEEE given identical seeds).

    Keys with fewer than 2m observations are dropped (seeding needs two
    full seasons). Keys parallelize; within-key is honest-sequential
    (the dtw convention). The recurrence is also expressible as a
    k = m+2 affine state  s_t = A·s_{t-1} + u_t·y_t  (level, trend, m
    seasonal slots with a cyclic-shift block), so :func:`affine_scan`
    is the single-huge-series scale path if ever needed; per-key
    grouping is the natural 100-TB shape for multi-series data.

    Output: keys + (ts, value, level, trend, seasonal, fitted).
    """
    m = int(season_length)
    if m < 2:
        raise ValueError(f"season_length must be >= 2, got {m}")
    for nm, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not (0.0 <= v <= 1.0) or (nm == "alpha" and v == 0.0):
            raise ValueError(f"{nm} out of range: {v}")
    keys = list(key_cols)
    one_a, one_b, one_g = 1.0 - alpha, 1.0 - beta, 1.0 - gamma
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(*keys, ts_col, F.col(value_col).cast("double").alias(value_col))
    cnt_w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    base = (
        base.withColumn("__n", F.count(F.lit(1)).over(cnt_w))
        .filter(F.col("__n") >= 2 * m)
        .drop("__n")
    )
    out_schema = ", ".join(
        [f"{c} {base.schema[c].dataType.simpleString()}" for c in keys]
        + [f"{ts_col} {base.schema[ts_col].dataType.simpleString()}",
           f"{value_col} double", "level double", "trend double",
           "seasonal double", "fitted double"]
    )

    def _hw(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(ts_col)
        y = g[value_col].to_numpy(dtype=np.float64)
        n = len(y)
        # integer-micro seed sums: exact, association-free (oracle
        # mirrors SUM(CAST(floor(x*1e6+0.5) AS HUGEINT)))
        y6 = np.floor(y * 1e6 + 0.5).astype(np.int64)
        l = float(int(y6[:m].sum())) / m / 1e6
        b = (float(int(y6[m : 2 * m].sum())) / m / 1e6 - l) / m
        s = [(y[j] / l if multiplicative else y[j] - l) for j in range(m)]
        lvl = np.empty(n); trd = np.empty(n); sea = np.empty(n); fit = np.empty(n)
        for t in range(n):
            s_old = s[0]
            yt = float(y[t])
            if multiplicative:
                fit[t] = (l + b) * s_old
                l_new = alpha * (yt / s_old) + one_a * (l + b)
                b = beta * (l_new - l) + one_b * b
                s_new = gamma * (yt / l_new) + one_g * s_old
            else:
                fit[t] = l + b + s_old
                l_new = alpha * (yt - s_old) + one_a * (l + b)
                b = beta * (l_new - l) + one_b * b
                s_new = gamma * (yt - l_new) + one_g * s_old
            l = l_new
            s = s[1:] + [s_new]
            lvl[t], trd[t], sea[t] = l, b, s_new
        res = g[[*keys, ts_col, value_col]].copy()
        res["level"], res["trend"] = lvl, trd
        res["seasonal"], res["fitted"] = sea, fit
        return res

    grouped = base.groupBy(*keys) if keys else base.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(_hw, schema=out_schema)


def holt_winters_forecast(
    df: DataFrame,
    alpha: float,
    beta: float,
    gamma: float,
    season_length: int,
    horizon: int,
    step_seconds: int,
    value_col: str = "value",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """h-step-ahead Holt-Winters additive forecasts per key
    (FPP §8.3):  ŷ_{n+h} = l_n + h·b_n + s_{n+h-m·(⌊(h-1)/m⌋+1)}.

    Runs :func:`holt_winters`, keeps each key's last m rows — the
    final seasonal queue IS their ``seasonal`` column (oldest =
    m-th-newest row) — plus the final (level, trend), all metadata
    scale, then explodes the horizon declaratively; the seasonal term
    for step h is the queue slot ((h-1) mod m) + 1 counted from the
    oldest, i.e. the row with descending rank m - ((h-1) mod m).
    """
    m = int(season_length)
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    keys = list(key_cols)
    sm = holt_winters(
        df, alpha, beta, gamma, m,
        value_col=value_col, ts_col=ts_col, key_cols=keys,
    )
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    lastm = (
        sm.withColumn("__rd", F.row_number().over(w.orderBy(F.col(ts_col).desc())))
        .filter(F.col("__rd") <= m)
        .select(*keys, ts_col, "level", "trend", "seasonal", "__rd")
    )
    final = lastm.filter(F.col("__rd") == 1).select(
        *keys, ts_col, "level", "trend"
    )
    hexp = F.posexplode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("__p", "h")
    fc = final.select(*keys, ts_col, "level", "trend", hexp)
    # queue slot for step h, as a descending row rank
    rd = F.lit(m) - (F.col("h") - F.lit(1)) % F.lit(m)
    fc = fc.withColumn("__rd", rd.cast("int"))
    seas = lastm.select(*keys, "__rd", F.col("seasonal").alias("__s"))
    out = fc.join(F.broadcast(seas), [*keys, "__rd"])
    step = F.col("h").cast("long") * F.lit(int(step_seconds))
    return out.select(
        *keys,
        F.timestamp_seconds(
            F.unix_timestamp(F.col(ts_col).cast("timestamp")) + step
        ).alias(ts_col),
        F.col("h").cast("int").alias("h"),
        (
            F.col("level")
            + F.col("h").cast("double") * F.col("trend")
            + F.col("__s")
        ).alias("yhat"),
    )


def kalman_level(
    df: DataFrame,
    q: float,
    r: float,
    value_col: str = "value",
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Kalman filter for the local-level model per key (random-walk
    state + observation noise; Harvey 1989 §3.2 / Durbin & Koopman
    §2.2 — public textbook form):

        predict:  m⁻ = m_{t-1},  P⁻ = P_{t-1} + q
        update:   K = P⁻ / (P⁻ + r)
                  m_t = m⁻ + K·(y_t − m⁻),  P_t = (1 − K)·P⁻

    Diffuse init: m_1 = y_1, P_1 = r (the P⁻→∞ limit of the update).
    Output: keys + (ts, value, level, p_var, gain) where ``level`` is
    the filtered mean E[μ_t | y_1..y_t].

    Scale/determinism shape (the holt/dtw convention): keys
    parallelize via grouped-map pandas; within-key is honestly
    sequential, mirrored 1:1 by a DuckDB recursive-CTE oracle. Note
    the gain schedule is DATA-INDEPENDENT — K_t converges
    geometrically to the steady state K∞ = P∞/(P∞ + r) with
    P∞ = (q + √(q² + 4qr))/2 (the positive root of the scalar
    Riccati fixed point P = (1−K)(P+q)), after which the filter IS
    an EWM with α = K∞ (``ewm_window``'s 100-TB scan path)
    — so the steady-state limit of this verb already has a fully
    distributed twin; this exact path adds the transient gains and
    the per-row posterior variance."""
    if q <= 0 or r <= 0:
        raise ValueError(f"need q > 0 and r > 0, got q={q}, r={r}")
    keys = list(key_cols)
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(*keys, ts_col, F.col(value_col).cast("double").alias(value_col))
    out_schema = ", ".join(
        [f"{c} {base.schema[c].dataType.simpleString()}" for c in keys]
        + [f"{ts_col} {base.schema[ts_col].dataType.simpleString()}",
           f"{value_col} double", "level double", "p_var double",
           "gain double"]
    )
    qf, rf = float(q), float(r)

    def _kalman(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values(ts_col)
        y = g[value_col].to_numpy(dtype=np.float64)
        n = len(y)
        lvl = np.empty(n); pv = np.empty(n); kn = np.empty(n)
        m, p = float(y[0]), rf
        lvl[0], pv[0], kn[0] = m, p, 1.0
        for t in range(1, n):
            # shape mirrored 1:1 by the recursive-CTE oracle
            p_pred = p + qf
            k = p_pred / (p_pred + rf)
            m = m + k * (float(y[t]) - m)
            p = (1.0 - k) * p_pred
            lvl[t], pv[t], kn[t] = m, p, k
        res = g[[*keys, ts_col, value_col]].copy()
        res["level"], res["p_var"], res["gain"] = lvl, pv, kn
        return res

    grouped = base.groupBy(*keys) if keys else base.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(_kalman, schema=out_schema)
