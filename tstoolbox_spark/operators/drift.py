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


def adf_test(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Dickey-Fuller unit-root t-statistic per key (lag-0 DF form,
    constant included): regress Δx_t on x_{t-1},

        Δx_t = α + β·x_{t-1} + ε_t,    t_DF = β̂ / se(β̂)

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
    szz_c = F.col("__szz") - F.col("__sz") * F.col("__sz") / n
    szy_c = F.col("__szy") - F.col("__sz") * F.col("__sy") / n
    syy_c = F.col("__syy") - F.col("__sy") * F.col("__sy") / n
    beta = szy_c / szz_c
    rss = syy_c - beta * szy_c
    sigma2 = rss / (n - F.lit(2.0))
    t_stat = beta / F.sqrt(sigma2 / szz_c)
    return agg.select(
        *keys,
        "n",
        _q6(beta).alias("beta"),
        _q6(t_stat).alias("t_stat"),
    )
