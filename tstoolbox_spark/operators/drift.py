"""Distribution-drift and stationarity diagnostics: PSI, two-sample
Kolmogorov-Smirnov, chi-square homogeneity, and the (augmented)
Dickey-Fuller unit-root t-statistic.

Engine extensions for corpus / feed monitoring — the reference stops
at descriptive statistics (gof, correlation, describe); a 100-TB
training pipeline also needs "did this snapshot's distribution move
vs the last one?" as a first-class, shuffle-bounded operator family:

- ``psi_buckets`` / ``psi`` — Population Stability Index between a
  reference and a current sample over fixed equal-width buckets
  (standard model-monitoring form: Siddiqi 2006, credit-scorecard
  literature). One union + one groupBy; counts are exact longs, so
  the statistic is a pure function of integers.
- ``ks_2sample`` — two-sample KS D-statistic with ties handled the
  classical way (ECDF evaluated at every distinct observed value).
  The global ECDF order rides :func:`~.stats.distributed_prefix_sums`
  (range partition + metadata offsets) — no single-task sort; the
  final argmax is a ``max(struct)`` aggregate with map-side partials.
- ``chi2_homogeneity`` — chi-square test that two snapshots share one
  categorical mix (event types, languages, sources). Pure counts.
- ``mann_kendall`` — the Mann-Kendall monotonic-trend test (Hirsch
  et al. 1982 hydrology form), exact S without the O(n²) pair join:
  time/value double bucketing splits pairs into three disjoint
  classes, each counted exactly (pandas within buckets, complete-grid
  window prefix sums across). Pairs with `stats.theil_sen`
  (magnitude) as the significance side of the trend verb.
- ``adf_test`` — Dickey-Fuller regression Δx_t = α + β·x_{t-1} + ε in
  closed form from six decimal-exact sums (same association-free
  aggregate shape as ``linear_trend``); t = β̂/se(β̂) is the classic
  unit-root stationarity diagnostic (Dickey & Fuller 1979), the
  natural companion to ``ljung_box`` (stats.py).

Determinism contract (house style, see ljung_box): every sum either
runs over exact integers/decimals or quantizes its float terms to a
fixed grid (floor(x·1eK + 0.5) longs) before aggregating, so shuffle
merge order cannot move any emitted value and the DuckDB oracles
match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .stats import distributed_prefix_sums

#: decimal type for exact value sums (house convention, stats.py)
_DEC = "decimal(38,10)"


def _q6(col):
    """Engine-identical half-up rounding to 6 dp (house convention)."""
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _bucket_counts(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    key_cols: Sequence[str],
) -> DataFrame:
    """(keys, bucket, cnt_ref, cnt_cur) over a complete 0..n-1 bucket
    spine; equal-width buckets with clamped edges — pure arithmetic so
    the identical expression runs in any SQL engine."""
    keys = list(key_cols)
    width = (hi - lo) / n_buckets
    b = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(0)
        ),
        F.lit(n_buckets - 1),
    ).cast("int")
    u = (
        ref.where(F.col(value_col).isNotNull())
        .select(*keys, b.alias("bucket"), F.lit(1).alias("__r"), F.lit(0).alias("__c"))
        .unionByName(
            cur.where(F.col(value_col).isNotNull()).select(
                *keys, b.alias("bucket"), F.lit(0).alias("__r"), F.lit(1).alias("__c")
            )
        )
    )
    counts = u.groupBy(*keys, "bucket").agg(
        F.sum("__r").alias("cnt_ref"), F.sum("__c").alias("cnt_cur")
    )
    spark = ref.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    if keys:
        spine = u.select(*keys).distinct().crossJoin(F.broadcast(spine))
    return (
        spine.join(counts, [*keys, "bucket"], "left")
        .fillna(0, ["cnt_ref", "cnt_cur"])
    )


def psi_buckets(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    eps: float = 1e-6,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-bucket PSI detail: (keys, bucket, cnt_ref, cnt_cur, p_ref,
    p_cur, psi_term) with proportions floored at ``eps`` so empty
    buckets contribute a finite term.

    Scale shape: one narrow union pass + one groupBy(bucket) with
    map-side combine; totals come from a window over the ≤n_buckets
    aggregated rows per key (metadata-sized after the agg, NOT a
    window over the input). Nothing leaves the JVM.
    """
    keys = list(key_cols)
    counts = _bucket_counts(ref, cur, value_col, lo, hi, n_buckets, keys)
    wk = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    tot_r = F.sum("cnt_ref").over(wk).cast("double")
    tot_c = F.sum("cnt_cur").over(wk).cast("double")
    p_ref = F.greatest(F.col("cnt_ref").cast("double") / tot_r, F.lit(float(eps)))
    p_cur = F.greatest(F.col("cnt_cur").cast("double") / tot_c, F.lit(float(eps)))
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return counts.select(
        *keys,
        "bucket",
        "cnt_ref",
        "cnt_cur",
        p_ref.alias("p_ref"),
        p_cur.alias("p_cur"),
        term.alias("psi_term"),
    )


def psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    eps: float = 1e-6,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Scalar PSI per key: Σ_b (p_cur − p_ref)·ln(p_cur/p_ref).

    The ≤n_buckets terms are quantized to 1e-12-grid longs before the
    final sum, so the reduction is association-free (rule of thumb:
    <0.1 stable, 0.1-0.25 moderate shift, >0.25 action)."""
    detail = psi_buckets(ref, cur, value_col, lo, hi, n_buckets, eps, key_cols)
    keys = list(key_cols)
    qterm = F.floor(F.col("psi_term") * F.lit(1e12) + F.lit(0.5))
    return detail.groupBy(*keys).agg(
        (F.sum(qterm).cast("double") / F.lit(1e12)).alias("psi"),
        F.sum("cnt_ref").alias("n_ref"),
        F.sum("cnt_cur").alias("n_cur"),
    )


def ks_2sample(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per key:
    D = max over distinct observed v of |F_ref(v) − F_cur(v)|, both
    ECDFs evaluated at every distinct value of the pooled sample (the
    classical ties-aware form). Emits (keys, d_stat, at_value, n_ref,
    n_cur) where ``at_value`` is the smallest value attaining D.

    Scale shape: groupBy(value) collapses the input to distinct
    values with exact long counts; ONE
    :func:`~.stats.distributed_prefix_sums` pass (range partition +
    per-partition windows + metadata offsets — no single-task global
    sort) aligns both cumulative counters over the global value
    order; the argmax is a ``max(struct(d, -value))`` aggregate, so
    partial combines apply all the way down. The ECDF ratios are
    integer/integer divisions — deterministic IEEE ops on exact
    inputs — and D is quantized to 12 dp for cross-engine parity.
    """
    keys = list(key_cols)
    u = (
        ref.where(F.col(value_col).isNotNull())
        .select(*keys, value_col, F.lit(1).alias("__r"), F.lit(0).alias("__c"))
        .unionByName(
            cur.where(F.col(value_col).isNotNull()).select(
                *keys, value_col, F.lit(0).alias("__r"), F.lit(1).alias("__c")
            )
        )
    )
    g = u.groupBy(*keys, value_col).agg(
        F.sum("__r").alias("__ca"), F.sum("__c").alias("__cb")
    )
    cum = distributed_prefix_sums(
        g, ["__ca", "__cb"], keys, [value_col], ["__pa", "__pb"]
    )
    # sample sizes via a per-key aggregate broadcast-joined back (the
    # _gof_two_pass pattern) — a window over the distinct-values frame
    # would funnel it through one task per key (or ONE task keyless).
    totals = g.groupBy(*keys).agg(
        F.sum("__ca").alias("n_ref"), F.sum("__cb").alias("n_cur")
    )
    joined = (
        cum.join(F.broadcast(totals), keys)
        if keys
        else cum.crossJoin(F.broadcast(totals))
    )
    fa = (F.col("__pa") + F.col("__ca")).cast("double") / F.col("n_ref").cast("double")
    fb = (F.col("__pb") + F.col("__cb")).cast("double") / F.col("n_cur").cast("double")
    d = F.floor(F.abs(fa - fb) * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)
    rows = joined.select(
        *keys,
        F.struct(
            d.alias("d"), (-F.col(value_col)).alias("negv")
        ).alias("__s"),
        "n_ref",
        "n_cur",
    )
    best = rows.groupBy(*keys).agg(
        F.max("__s").alias("__m"),
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
    )
    return best.select(
        *keys,
        F.col("__m.d").alias("d_stat"),
        (-F.col("__m.negv")).alias("at_value"),
        "n_ref",
        "n_cur",
    )


def chi2_homogeneity(
    ref: DataFrame,
    cur: DataFrame,
    cat_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Chi-square homogeneity test that two snapshots draw from one
    categorical distribution: χ² = Σ_cells (o − e)²/e over the
    2×n_categories contingency table, dof = n_categories − 1. Emits
    (keys, chi2, dof, n_ref, n_cur).

    One union + one groupBy(cat) produces exact long counts; expected
    counts and per-cell terms are deterministic float functions of
    those integers, quantized to 1e-9-grid longs before the final
    association-free sum. Map-side combine end to end."""
    keys = list(key_cols)
    u = (
        ref.where(F.col(cat_col).isNotNull())
        .select(*keys, cat_col, F.lit(1).alias("__r"), F.lit(0).alias("__c"))
        .unionByName(
            cur.where(F.col(cat_col).isNotNull()).select(
                *keys, cat_col, F.lit(0).alias("__r"), F.lit(1).alias("__c")
            )
        )
    )
    counts = u.groupBy(*keys, cat_col).agg(
        F.sum("__r").alias("__or"), F.sum("__c").alias("__oc")
    )
    wk = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    n_r = F.sum("__or").over(wk)
    n_c = F.sum("__oc").over(wk)
    grand = (n_r + n_c).cast("double")
    rowtot = (F.col("__or") + F.col("__oc")).cast("double")
    e_r = rowtot * n_r.cast("double") / grand
    e_c = rowtot * n_c.cast("double") / grand
    o_r = F.col("__or").cast("double")
    o_c = F.col("__oc").cast("double")
    term = (o_r - e_r) * (o_r - e_r) / e_r + (o_c - e_c) * (o_c - e_c) / e_c
    qterm = F.floor(term * F.lit(1e9) + F.lit(0.5))
    cells = counts.select(
        *keys,
        qterm.alias("__qt"),
        n_r.alias("__nr"),
        n_c.alias("__nc"),
    )
    return cells.groupBy(*keys).agg(
        (F.sum("__qt").cast("double") / F.lit(1e9)).alias("chi2"),
        (F.count(F.lit(1)) - F.lit(1)).cast("int").alias("dof"),
        F.max("__nr").alias("n_ref"),
        F.max("__nc").alias("n_cur"),
    )


def mann_kendall(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    n_buckets: int | None = None,
    max_bucket_rows: int = 20_000,
) -> DataFrame:
    """Mann-Kendall monotonic-trend test per key (Mann 1945 /
    Kendall 1975, the Hirsch et al. 1982 hydrology form — the
    reference's Theil-Sen slope (`stats.theil_sen`) reports the trend
    MAGNITUDE; this is the matching nonparametric SIGNIFICANCE test):

        S = Σ_{t_i < t_j} sign(x_j − x_i)
        Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18
        Z = (S − sign(S)) / sqrt(Var(S))        (continuity-corrected)

    Emits (keys, n, s_stat, var_s, z_stat).

    Scale shape — exact S WITHOUT the O(n²) pair join `theil_sen`
    needs. Rows bucket twice: by time range (pure function of ts, so
    equal timestamps share a bucket and cross-bucket pairs are
    strictly time-ordered) and by value quantile (pinned
    percentile_approx bounds, the `stats.distributed_rank` idiom —
    equal values share a bucket, so cross-bucket value order is
    strict). Every pair then falls in exactly ONE of three classes:

    * SAME time-bucket — counted exactly per (key, tb) group in a
      grouped-map pandas stage (chunked numpy sign matrix over the
      raw (ts, value) rows, integer result);
    * CROSS time-bucket, SAME value-bucket — rows first aggregate to
      (tb, value, count), then a pandas stage per (key, vb) counts
      Σ c₁c₂·sign(v₂−v₁) over tb₁<tb₂ pairs exactly;
    * CROSS time-bucket, CROSS value-bucket — the pair's sign is
      fully determined by bucket order, so it reduces to the
      (tb × vb) count grid (completed with a zero-filled spine so
      absent cells still count) and two partitioned window
      prefix-sums: earlier-time per vb, then smaller/larger-vb per
      tb. No self-join, no single-task sort anywhere.

    Every intermediate is an integer count, so the statistic is a
    pure function of the input (house determinism contract).
    Duplicate timestamps: pairs sharing a timestamp are excluded from
    S (they are not time-ordered); Var(S) applies the standard
    value-ties correction (the classical test assumes distinct
    sampling times)."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    keys = list(key_cols)
    gkeys = keys or ["__g"]
    nb = int(n_buckets or spark.sparkContext.defaultParallelism * 4)
    pts = df.select(
        *keys,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
    ).where(F.col("__v").isNotNull())
    if not keys:
        pts = pts.withColumn("__g", F.lit(1))
    # per-key time range + value-quantile bounds → both bucket ids as
    # pure arithmetic functions of (ts, value) (metadata-scale
    # collect, pinned as literals — stats.distributed_rank's idiom,
    # so every downstream job derives identical bucket ids)
    qs = [i / nb for i in range(1, nb)]
    rng = pts.groupBy(*gkeys).agg(
        F.min("__t").alias("__mn"),
        F.max("__t").alias("__mx"),
        F.percentile_approx("__v", qs, 1_000).alias("__qb"),
    ).collect()
    k_schema = ", ".join(
        [f"{k} {pts.schema[k].dataType.simpleString()}" for k in gkeys]
        + ["__mn long", "__w double", "__vbs array<double>"]
    )
    bounds = spark.createDataFrame(
        [
            (*[r[k] for k in gkeys], r["__mn"],
             max(float(r["__mx"] - r["__mn"]), 1.0) / nb,
             [float(b) for b in (r["__qb"] or [])])
            for r in rng
        ],
        k_schema,
    )
    bucketed = (
        pts.join(F.broadcast(bounds), gkeys)
        .withColumn(
            "__b",
            F.least(
                F.floor((F.col("__t") - F.col("__mn")) / F.col("__w")),
                F.lit(nb - 1),
            ).cast("long"),
        )
        # value bucket = #bounds <= v: equal values always share a
        # bucket and bucket order is strict value order
        .withColumn(
            "__vb",
            F.size(
                F.filter(F.col("__vbs"), lambda b: b <= F.col("__v"))
            ).cast("long"),
        )
        .drop("__mn", "__w", "__vbs")
    )

    # ---- within-bucket S: exact chunked sign count per group --------
    out_schema = ", ".join(
        [f"{k} {pts.schema[k].dataType.simpleString()}" for k in gkeys]
        + ["__b long", "__s long"]
    )

    def _local_s(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m > max_bucket_rows:
            raise ValueError(
                f"mann_kendall: a (key, time-bucket) group has {m} rows "
                f"(> {max_bucket_rows}); raise n_buckets (got {nb}) so "
                "within-bucket pair counting stays bounded"
            )
        t = pdf["__t"].to_numpy(np.int64)
        v = pdf["__v"].to_numpy(np.float64)
        s = 0
        for lo in range(0, m, 2048):
            hi = min(lo + 2048, m)
            later = t[None, :] > t[lo:hi, None]
            s += int((np.sign(v[None, :] - v[lo:hi, None]) * later).sum())
        head = {k: [pdf[k].iloc[0]] for k in gkeys}
        head["__b"] = [pdf["__b"].iloc[0]]
        head["__s"] = [s]
        return pd.DataFrame(head)

    local = (
        bucketed.groupBy(*gkeys, "__b")
        .applyInPandas(_local_s, out_schema)
        .groupBy(*gkeys)
        .agg(F.sum("__s").alias("__s_local"))
    )

    # ---- cross time-bucket, SAME value-bucket: exact pandas over the
    # (tb, value) count rows of each (key, vb) group ------------------
    cv = bucketed.groupBy(*gkeys, "__vb", "__b", "__v").agg(
        F.count(F.lit(1)).alias("__c")
    )
    sv_schema = ", ".join(
        [f"{k} {pts.schema[k].dataType.simpleString()}" for k in gkeys]
        + ["__vb long", "__s long"]
    )

    def _same_vb_s(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m > max_bucket_rows:
            raise ValueError(
                f"mann_kendall: a (key, value-bucket) group has {m} "
                f"distinct (time-bucket, value) rows (> {max_bucket_rows}); "
                f"raise n_buckets (got {nb})"
            )
        b = pdf["__b"].to_numpy(np.int64)
        v = pdf["__v"].to_numpy(np.float64)
        c = pdf["__c"].to_numpy(np.int64)
        s = 0
        for lo in range(0, m, 2048):
            hi = min(lo + 2048, m)
            later = b[None, :] > b[lo:hi, None]
            sgn = np.sign(v[None, :] - v[lo:hi, None])
            s += int((c[lo:hi, None] * c[None, :] * sgn * later).sum())
        head = {k: [pdf[k].iloc[0]] for k in gkeys}
        head["__vb"] = [pdf["__vb"].iloc[0]]
        head["__s"] = [s]
        return pd.DataFrame(head)

    same_vb = (
        cv.groupBy(*gkeys, "__vb")
        .applyInPandas(_same_vb_s, sv_schema)
        .groupBy(*gkeys)
        .agg(F.sum("__s").alias("__s_same_vb"))
    )

    # ---- cross time-bucket, CROSS value-bucket: bucket order fully
    # determines the sign, so this reduces to the (tb × vb) count grid
    # completed with a zero-filled spine (absent cells still separate
    # the prefix sums) and two partitioned window prefix-sums --------
    cells = bucketed.groupBy(*gkeys, "__b", "__vb").agg(
        F.count(F.lit(1)).alias("__c")
    )
    spine = (
        pts.select(*gkeys)
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(nb)
                .select(F.col("id").alias("__b"))
                .crossJoin(spark.range(nb).select(F.col("id").alias("__vb")))
            )
        )
    )
    grid = spine.join(cells, [*gkeys, "__b", "__vb"], "left").fillna(0, ["__c"])
    w_tb = (
        Window.partitionBy(*gkeys, "__vb")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grid = grid.withColumn(
        "__earlier", F.coalesce(F.sum("__c").over(w_tb), F.lit(0))
    )
    w_lt = (
        Window.partitionBy(*gkeys, "__b")
        .orderBy("__vb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_gt = (
        Window.partitionBy(*gkeys, "__b")
        .orderBy("__vb")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    grid = grid.withColumn(
        "__lt", F.coalesce(F.sum("__earlier").over(w_lt), F.lit(0))
    ).withColumn("__gt", F.coalesce(F.sum("__earlier").over(w_gt), F.lit(0)))
    cross_vb = grid.groupBy(*gkeys).agg(
        F.sum(F.col("__c") * (F.col("__lt") - F.col("__gt"))).alias(
            "__s_cross_vb"
        )
    )

    # ---- ties + n → Var(S), Z ----------------------------------------
    tie = (
        bucketed.groupBy(*gkeys, "__v")
        .agg(F.count(F.lit(1)).alias("__tg"))
        .groupBy(*gkeys)
        .agg(
            F.sum("__tg").alias("n"),
            F.sum(
                F.col("__tg") * (F.col("__tg") - 1) * (2 * F.col("__tg") + 5)
            ).alias("__ties"),
        )
    )
    s = (
        F.col("__s_local") + F.col("__s_same_vb") + F.col("__s_cross_vb")
    ).cast("long")
    n = F.col("n").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("__ties").cast("double")
    ) / F.lit(18.0)
    z = F.when(
        (s == 0) | (var_s <= 0), F.lit(0.0)
    ).otherwise((s - F.signum(s.cast("double"))) / F.sqrt(var_s))
    out = (
        local.join(same_vb, gkeys)
        .join(cross_vb, gkeys)
        .join(tie, gkeys)
        .select(
            *keys,
            "n",
            s.alias("s_stat"),
            _q6(var_s).alias("var_s"),
            _q6(z).alias("z_stat"),
        )
    )
    return out


def adf_test(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    constant: bool = True,
) -> DataFrame:
    """Dickey-Fuller unit-root t-statistic per key (lag-0 DF form,
    constant included by default): regress Δx_t on x_{t-1},

        Δx_t = α + β·x_{t-1} + ε_t,    t_DF = β̂ / se(β̂)

    ``constant=False`` drops α (the 'n' regression of the DF family) —
    the form Engle-Granger's second stage applies to mean-zero
    cointegration residuals.

    β̂ < 0 with a large-magnitude t (vs the DF critical values, e.g.
    −2.86 at 5% for the constant form) rejects the unit root — i.e.
    the series is stationary. Emits (keys, n, beta, t_stat).

    Everything reduces to ONE window sort (the x_{t-1} lag) + ONE
    aggregate of six sums (n, Σz, Σy, Σzy, Σzz, Σyy with z = x_{t-1},
    y = Δx_t), each cast to decimal(38,10) so the shuffle-merge order
    cannot move the result (exact arithmetic, same convention as
    linear_trend / ljung_box); the closed-form OLS slope, residual
    variance and standard error then follow on the driver-free
    aggregated row. Same shape as the reference's trend fit
    (/root/reference/tstoolbox/functions/fit.py:94-150) — the
    reference has no stationarity test; this is the engine extension
    pairing with ljung_box."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(ts_col) if keys else (
        Window.partitionBy(F.lit(1)).orderBy(ts_col)
    )
    z = F.lag(F.col(value_col)).over(w)
    pre = df.select(
        *keys,
        z.alias("__z"),
        (F.col(value_col) - z).alias("__y"),
    ).where(F.col("__z").isNotNull())
    zc, yc = F.col("__z"), F.col("__y")
    agg = pre.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(zc.cast(_DEC)).cast("double").alias("__sz"),
        F.sum(yc.cast(_DEC)).cast("double").alias("__sy"),
        F.sum((zc * yc).cast(_DEC)).cast("double").alias("__szy"),
        F.sum((zc * zc).cast(_DEC)).cast("double").alias("__szz"),
        F.sum((yc * yc).cast(_DEC)).cast("double").alias("__syy"),
    )
    n = F.col("n").cast("double")
    if constant:
        szz_c = F.col("__szz") - F.col("__sz") * F.col("__sz") / n
        szy_c = F.col("__szy") - F.col("__sz") * F.col("__sy") / n
        syy_c = F.col("__syy") - F.col("__sy") * F.col("__sy") / n
        dof = n - F.lit(2.0)
    else:
        szz_c, szy_c, syy_c = F.col("__szz"), F.col("__szy"), F.col("__syy")
        dof = n - F.lit(1.0)
    beta = szy_c / szz_c
    rss = syy_c - beta * szy_c
    sigma2 = rss / dof
    t_stat = beta / F.sqrt(sigma2 / szz_c)
    return agg.select(
        *keys,
        "n",
        _q6(beta).alias("beta"),
        _q6(t_stat).alias("t_stat"),
    )


def engle_granger(
    df: DataFrame,
    x_col: str,
    y_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Engle-Granger two-step cointegration test per key (Engle &
    Granger 1987): do two non-stationary series share a stationary
    linear combination?

        stage 1:  y_t = a + b·x_t + e_t      (OLS, closed form)
        stage 2:  Δe_t = β·e_{t-1} + ε_t     (no-constant DF on e)

    A strongly negative stage-2 t (vs the Engle-Granger critical
    values, e.g. −3.34 at 5% for one regressor) rejects "no
    cointegration". Emits (keys, n, slope, intercept, adf_beta,
    adf_t) — slope/intercept are the cointegrating vector.

    Scale shape: stage 1 is ONE aggregate of five decimal-exact sums
    (linear_trend's shape) broadcast back as a one-row-per-key join;
    the residual projection is a pure column expression; stage 2 is
    :func:`adf_test` (one lag window + one aggregate). Every sum is
    decimal(38,10)-exact, so the statistic is a pure function of the
    input (house determinism contract); pairs with
    :func:`~.stats.granger_causality` (predictive direction) and
    :func:`adf_test` (single-series stationarity)."""
    keys = list(key_cols)
    gkeys = keys or ["__g"]
    pts = df.select(
        *keys,
        F.col(ts_col).alias("__ts"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    ).where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    if not keys:
        pts = pts.withColumn("__g", F.lit(1))
    xc, yc = F.col("__x"), F.col("__y")
    ols = pts.groupBy(*gkeys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(xc.cast(_DEC)).cast("double").alias("__sx"),
        F.sum(yc.cast(_DEC)).cast("double").alias("__sy"),
        F.sum((xc * yc).cast(_DEC)).cast("double").alias("__sxy"),
        F.sum((xc * xc).cast(_DEC)).cast("double").alias("__sxx"),
    )
    nn = F.col("__n").cast("double")
    slope = (nn * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / (
        nn * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    )
    fit = ols.select(
        *gkeys,
        F.col("__n").alias("n"),
        slope.alias("slope"),
        ((F.col("__sy") - slope * F.col("__sx")) / nn).alias("intercept"),
    )
    resid = pts.join(F.broadcast(fit), gkeys).select(
        *gkeys,
        "n",
        "slope",
        "intercept",
        F.col("__ts").alias("ts"),
        (yc - F.col("intercept") - F.col("slope") * xc).alias("__e"),
    )
    stage2 = adf_test(
        resid, "__e", ts_col="ts", key_cols=[*gkeys], constant=False
    ).select(
        *gkeys,
        F.col("beta").alias("adf_beta"),
        F.col("t_stat").alias("adf_t"),
    )
    out = (
        resid.select(*gkeys, "n", "slope", "intercept")
        .distinct()
        .join(stage2, gkeys)
        .select(
            *keys,
            "n",
            _q6(F.col("slope")).alias("slope"),
            _q6(F.col("intercept")).alias("intercept"),
            "adf_beta",
            "adf_t",
        )
    )
    return out


def benford_digits(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law per key —
    the classic fabricated/degenerate-numeric-data screen (Benford
    1938; Nigrini's audit usage). Output: one row per (key, digit)
    with the observed count, the Benford-expected count
    n·log10(1 + 1/d), and the key's chi-square distance (repeated per
    row; each (obs−exp)²/exp term is quantized to 1e-6 and summed as
    BIGINT so the statistic is association-free).

    Positive values only (zero/negative/null rows are excluded from
    n). One narrow groupBy on (key, digit) — at most 9 rows per key —
    plus a broadcast per-key total.

    The first significant digit comes from the value's string
    representation (first ``[1-9]`` character — correct in both
    positional and scientific notation, since a mantissa leads with
    the first significant digit), NOT from floor(log10)/pow doubles:
    ulp error at power-of-ten magnitudes can yield digit 0 or 10
    there, silently dropping rows from the 1–9 grid while still
    counting them in n (ADVICE r3).
    """
    keys = list(key_cols)
    v = F.col(value_col)
    digit = F.regexp_extract(v.cast("string"), "[1-9]", 0).cast("int")
    pos = df.filter(v.isNotNull() & (v > 0)).select(
        *keys, digit.alias("digit")
    )
    obs = pos.groupBy(*keys, "digit").agg(F.count("*").alias("obs"))
    tot = pos.groupBy(*keys).agg(F.count("*").alias("__n"))
    # every key contributes all 9 digit rows: a digit with zero
    # observations still owes its (0 − exp)²/exp chi-square term —
    # dropping it understates the distance exactly when data is most
    # non-conforming (e.g. an all-digit-1 metric).
    digits = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    full = tot.crossJoin(F.broadcast(digits))
    j = full.join(obs, [*keys, "digit"], "left").withColumn(
        "obs", F.coalesce(F.col("obs"), F.lit(0))
    )
    exp = F.col("__n") * F.log10(1.0 + 1.0 / F.col("digit"))
    term = F.floor(
        (F.col("obs") - exp) * (F.col("obs") - exp) / exp * 1e6 + 0.5
    ).cast("long")
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    return j.select(
        *keys,
        "digit",
        F.col("obs").cast("long").alias("obs"),
        F.round(exp, 6).alias("exp"),
        (F.sum(term).over(w).cast("double") / 1e6).alias("chi2"),
        F.col("__n").cast("long").alias("n"),
    )
