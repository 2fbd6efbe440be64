"""``peak_detection`` — mark relative extrema.

Reference: /root/reference/tstoolbox/functions/peak_detection.py —
method='rel' (argrelextrema-style, :17-73): a point is a peak iff it
is strictly greater than ALL points within ±window rows; valleys
symmetric. Output keeps the input shape with non-extrema nulled
(:992-1006).

Spark mapping: window max/min over the ±k row frame, excluding the
current row by comparing against the max of (before-frame, after-frame)
— two frames per extremum kind, all sharing the one (key, ts) sort.

method='minmax' (:198-300, the billauer.co.il state machine) and
method='zero_crossing' (:408-490, smoothed-sign-change binning) are
whole-series sequential algorithms → per-key grouped-map transcriptions
(the series fed to peak detection is an aggregated tier, metadata-sized
next to the raw corpus, so one task per key is the right plan).
Curve-fit methods (parabola/sine) need scipy.optimize — out of scope
in this container (README).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
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


def _minmax_scan(y: np.ndarray, lookahead: int):
    """Transcription of the reference's _peakdetect state machine
    (peak_detection.py:198-300) with delta=0: alternating max/min
    candidates confirmed by a forward-window check; the first emitted
    extremum is always a false hit and is dropped (:289-296)."""
    max_peaks: list[tuple[int, float]] = []
    min_peaks: list[tuple[int, float]] = []
    dump: list[bool] = []
    length = len(y)
    mn, mx = np.inf, -np.inf
    mxpos = mnpos = 0
    for index in range(max(length - lookahead, 0)):
        yv = y[index]
        if yv > mx:
            mx, mxpos = yv, index
        if yv < mn:
            mn, mnpos = yv, index
        if yv < mx and mx != np.inf:
            if y[index : index + lookahead].max() < mx:
                max_peaks.append((mxpos, mx))
                dump.append(True)
                mx = np.inf
                mn = np.inf
                if index + lookahead >= length:
                    break
                continue
        if yv > mn and mn != -np.inf:
            if y[index : index + lookahead].min() > mn:
                min_peaks.append((mnpos, mn))
                dump.append(False)
                mn = -np.inf
                mx = -np.inf
                if index + lookahead >= length:
                    break
    if dump:
        if dump[0]:
            if max_peaks:
                max_peaks.pop(0)
        elif min_peaks:
            min_peaks.pop(0)
    return max_peaks, min_peaks


def _zero_crossing_scan(y: np.ndarray, window: int):
    """Transcription of _peakdetect_zero_crossing (:408-490): bins
    bounded by the zero crossings of the mean-subtracted,
    hanning-smoothed series ( _smooth pads reflectively and the [:n]
    slice makes the smoothing window BACKWARD-looking, :492-545 /
    :547-580); even/odd bins alternate max/min picks."""
    n = len(y)
    ym = y - y.mean()
    wl = window
    if wl >= 3 and n >= wl:
        s = np.r_[ym[wl - 1 : 0 : -1], ym, ym[-1:-wl:-1]]
        w = np.hanning(wl)
        sm = np.convolve(w / w.sum(), s, mode="valid")[:n]
    else:
        sm = ym
    crossings = np.where(np.diff(np.sign(sm)))[0]
    if len(crossings) < 1:
        raise ValueError("no zero crossings found — signal never crosses its mean")
    indices = [int(i) for i in crossings if i != 0]
    zero_idx = np.unique(np.concatenate(([0], indices, [n - 1])))
    period_lengths = np.diff(zero_idx)
    bins_y = [y[i : i + d] for i, d in zip(zero_idx, period_lengths)]
    starts = list(zero_idx[:-1])
    even_y = bins_y[::2]
    odd_y = bins_y[1::2]
    even_s = starts[::2]
    odd_s = starts[1::2]
    if abs(even_y[0].max()) > abs(even_y[0].min()):
        hi_bins, lo_bins = zip(even_s, even_y), zip(odd_s, odd_y)
    else:
        hi_bins, lo_bins = zip(odd_s, odd_y), zip(even_s, even_y)
    max_peaks = []
    for start, by in hi_bins:
        pk = by.max()
        pos = start + int(np.where(by == pk)[0][0])
        if pos != 0:
            max_peaks.append((pos, pk))
    min_peaks = []
    for start, by in lo_bins:
        pk = by.min()
        pos = start + int(np.where(by == pk)[0][0])
        if pos != 0:
            min_peaks.append((pos, pk))
    return max_peaks, min_peaks


def peak_detection_scan(
    df: DataFrame,
    method: str = "minmax",
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    window: int = 24,
    peaks: bool = True,
    valleys: bool = False,
) -> DataFrame:
    """Whole-series peak detection (method='minmax'/'zero_crossing').

    Mirrors the reference's public-API window handling
    (peak_detection.py:955-970): minmax halves the window (floor, min
    1) into the state machine's lookahead; zero_crossing forces it odd.
    Output keeps the input shape with ``{col}_peak`` / ``{col}_valley``
    non-null only at detected extrema (:992-1006).
    """
    if method not in ("minmax", "zero_crossing"):
        raise ValueError(f"method must be minmax/zero_crossing, got {method!r}")
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    if method == "minmax":
        eff_window = max(int(window / 2), 1)
        scan = _minmax_scan
    else:
        eff_window = window + 1 if window % 2 == 0 else window
        scan = _zero_crossing_scan
    keys = list(key_cols)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    for c in value_cols:
        if peaks:
            schema += f", {c}_peak double"
        if valleys:
            schema += f", {c}_valley double"

    def _detect(pdf):
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        for c in value_cols:
            y = pdf[c].to_numpy(dtype=np.float64)
            mxp, mnp = scan(y, eff_window)
            if peaks:
                col = np.full(len(y), np.nan)
                for pos, val in mxp:
                    col[pos] = val
                pdf[f"{c}_peak"] = col
            if valleys:
                col = np.full(len(y), np.nan)
                for pos, val in mnp:
                    col[pos] = val
                pdf[f"{c}_valley"] = col
        return pdf

    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__g"))
    out = grouped.applyInPandas(_detect, schema=schema)
    # Arrow carries np.nan through as double NaN; non-extremum rows
    # should be SQL NULL like the window-based path emits.
    for c in value_cols:
        for suffix, on in (("peak", peaks), ("valley", valleys)):
            if on:
                col = f"{c}_{suffix}"
                out = out.withColumn(col, F.when(~F.isnan(F.col(col)), F.col(col)))
    return out


def peak_parabola(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    window: int = 1,
    points: int = 9,
) -> DataFrame:
    """``peak_detection`` method='parabola' — refine each raw extremum
    by fitting ``y = k*(x - tau)**2 + m`` over ``points`` samples around
    it and reporting the fitted apex (tau, m).

    Reference: /root/reference/tstoolbox/functions/peak_detection.py:389-441
    (``_peakdetect_parabola``) with the fitter at :152-196. The reference
    calls scipy.optimize.curve_fit, but the model is LINEAR in the
    reparameterization ``y = a*x**2 + b*x + c`` (tau = -b/2a,
    m = c - b**2/4a), so the least-squares fit has a closed form. Taking
    the regressor as the row offset u in -h..h (h = points//2) makes the
    odd design moments vanish and the normal equations collapse to::

        B = sum(u*y)/K2
        A = (n*sum(u**2*y) - K2*sum(y)) / (n*K4 - K2**2)
        C = (sum(y) - A*K2)/n
        tau = ts + (-B/(2A))*step,   m = C - B**2/(4A)

    with n = 2h+1, K2 = sum(j**2), K4 = sum(j**4). Spark shape: one
    (key, ts) sort shared by the extremum test and the 2h lead/lag
    neighbor columns the centered sums are built from — O(points) work
    per row, no UDF, a single window pass. The sums use the lead/lag
    values DIRECTLY (S1 = Σ j·y[i+j] term by term) rather than
    row_number-expanded global moments: the latter subtracts ~rn²·y
    scale intermediates and loses ~8 digits to cancellation, which a
    value-hash oracle would see. Raw extrema are method='rel' strict
    neighbor-max peaks (the refinement algebra is detector-agnostic);
    only frame-complete interior peaks are emitted, as a boundary slice
    would change the design moments. ``step`` is the local grid spacing
    (lead - lag)/2 in seconds, exact on a regular tier grid.
    """
    points += 1 - points % 2  # ref :416 forces odd
    h = points // 2
    n = float(points)
    k2 = float(sum(j * j for j in range(-h, h + 1)))
    k4 = float(sum(j ** 4 for j in range(-h, h + 1)))
    denom = n * k4 - k2 * k2

    base = Window.partitionBy(*key_cols).orderBy(ts_col)
    before = base.rowsBetween(-window, -1)
    after = base.rowsBetween(1, window)

    y = F.col(value_col)
    ts_s = F.col(ts_col).cast("double")

    # y[i+j] for j = -h..h, all over the one shared sort.
    def yj(j: int):
        if j < 0:
            return F.lag(y, -j).over(base)
        if j > 0:
            return F.lead(y, j).over(base)
        return y

    neighbors = {j: yj(j) for j in range(-h, h + 1)}
    out = df.withColumn(
        "__is_peak",
        (y > F.max(y).over(before)) & (y > F.max(y).over(after)),
    ).withColumn("__step",
                 (F.lead(ts_s, 1).over(base) - F.lag(ts_s, 1).over(base))
                 / F.lit(2.0))
    for j, expr in neighbors.items():
        if j != 0:
            out = out.withColumn(f"__y{j:+d}", expr)

    def nb(j: int):
        return y if j == 0 else F.col(f"__y{j:+d}")

    complete = F.lit(True)
    for j in range(-h, h + 1):
        if j != 0:
            complete = complete & nb(j).isNotNull()
    out = out.filter(F.col("__is_peak") & complete)

    # Left-to-right ascending-j summation; the SQL oracle mirrors the
    # identical term order so float rounding agrees to the last ulp.
    s0 = sum((nb(j) for j in range(-h + 1, h + 1)), nb(-h))
    s1 = sum((F.lit(float(j)) * nb(j) for j in range(-h + 1, h + 1)),
             F.lit(float(-h)) * nb(-h))
    s2 = sum((F.lit(float(j * j)) * nb(j) for j in range(-h + 1, h + 1)),
             F.lit(float(h * h)) * nb(-h))
    b = s1 / F.lit(k2)
    a = (F.lit(n) * s2 - F.lit(k2) * s0) / F.lit(denom)
    c = (s0 - a * F.lit(k2)) / F.lit(n)
    out = out.filter(a != F.lit(0.0))
    off = -b / (F.lit(2.0) * a)
    return out.select(
        *key_cols,
        F.col(ts_col),
        y.alias("peak_raw"),
        (ts_s + off * F.col("__step")).alias("tau_epoch_s"),
        (c - b * b / (F.lit(4.0) * a)).alias("peak_fitted"),
    )


def peak_sine(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    window: int = 1,
    points: int = 9,
) -> DataFrame:
    """``peak_detection`` method='sine' — refine each raw extremum by
    fitting ``y = m + A*sin(w*t + phi)`` over ``points`` samples and
    reporting the nearest fitted apex (tau, m + A).

    Reference: /root/reference/tstoolbox/functions/peak_detection.py:443-530
    (``_peakdetect_sine``, model ``A*sin(2*pi*f*x - tau)``). The
    reference estimates the parameters with scipy.optimize.curve_fit
    (absent here, and a per-peak iterative optimizer cannot be a
    distributed column expression anyway). Same model class, different
    estimator — a deterministic closed form in three linear steps:

    1. Any sampled sinusoid-plus-offset satisfies the Prony identity
       ``y[j+1] + y[j-1] = 2c*y[j] + d`` with ``c = cos(w*step)`` and
       ``d = 2m(1-c)``. (c, d) is an ordinary 2-parameter linear LSQ
       over the window's interior samples -> closed-form slope/
       intercept, giving ``w = acos(c)/step`` and ``m = d/(2(1-c))``.
    2. Given w and m, ``y - m = a*sin(w t) + b*cos(w t)`` is linear in
       (a, b): 2x2 Cramer on centered sample positions.
    3. ``A = hypot(a, b)``, ``phi = atan2(b, a)``; the apex nearest the
       raw peak is ``t* = (pi/2 - phi)/w`` wrapped to one period.

    On data that IS locally sinusoidal both estimators agree with the
    truth (unit-tested); on other data they disagree with each other —
    this one is reproducible and O(points) per row, the reference's
    depends on curve_fit initialization. Spark shape: identical to
    peak_parabola (one shared sort, 2h lead/lag columns, ascending-j
    left-assoc sums the SQL oracle mirrors term by term); rows whose
    window admits no sine fit (|c| >= 1 or a singular step-2 system)
    are dropped, mirrorably.
    """
    import math

    points += 1 - points % 2  # ref :521 forces odd
    h = points // 2

    base = Window.partitionBy(*key_cols).orderBy(ts_col)
    before = base.rowsBetween(-window, -1)
    after = base.rowsBetween(1, window)

    y = F.col(value_col)
    ts_s = F.col(ts_col).cast("double")

    out = df.withColumn(
        "__is_peak",
        (y > F.max(y).over(before)) & (y > F.max(y).over(after)),
    ).withColumn("__step",
                 (F.lead(ts_s, 1).over(base) - F.lag(ts_s, 1).over(base))
                 / F.lit(2.0))
    for j in range(-h, h + 1):
        if j != 0:
            expr = F.lag(y, -j).over(base) if j < 0 else F.lead(y, j).over(base)
            out = out.withColumn(f"__y{j:+d}", expr)

    def nb(j: int):
        return y if j == 0 else F.col(f"__y{j:+d}")

    complete = F.lit(True)
    for j in range(-h, h + 1):
        if j != 0:
            complete = complete & nb(j).isNotNull()
    out = out.filter(F.col("__is_peak") & complete)

    # step 1: Prony LSQ for (c, d) over interior samples j=-h+1..h-1
    inner = list(range(-h + 1, h))
    q = float(len(inner))

    def u(j: int):
        return nb(j + 1) + nb(j - 1)

    sv = sum((nb(j) for j in inner[1:]), nb(inner[0]))
    su = sum((u(j) for j in inner[1:]), u(inner[0]))
    suv = sum((u(j) * nb(j) for j in inner[1:]), u(inner[0]) * nb(inner[0]))
    svv = sum((nb(j) * nb(j) for j in inner[1:]), nb(inner[0]) * nb(inner[0]))
    den1 = F.lit(q) * svv - sv * sv
    out = out.filter(den1 != F.lit(0.0))
    alpha = (F.lit(q) * suv - su * sv) / den1
    dd = (su - alpha * sv) / F.lit(q)
    c = alpha / F.lit(2.0)
    out = out.filter(F.abs(c) < F.lit(1.0))
    th = F.acos(c)  # w*step, radians per sample
    m = dd / (F.lit(2.0) * (F.lit(1.0) - c))

    # step 2: (a, b) by 2x2 Cramer on centered positions j=-h..h
    js = list(range(-h, h + 1))

    def sj(j: int):
        return F.sin(th * F.lit(float(j)))

    def kj(j: int):
        return F.cos(th * F.lit(float(j)))

    sss = sum((sj(j) * sj(j) for j in js[1:]), sj(js[0]) * sj(js[0]))
    ssk = sum((sj(j) * kj(j) for j in js[1:]), sj(js[0]) * kj(js[0]))
    skk = sum((kj(j) * kj(j) for j in js[1:]), kj(js[0]) * kj(js[0]))
    ssy = sum((sj(j) * (nb(j) - m) for j in js[1:]),
              sj(js[0]) * (nb(js[0]) - m))
    sky = sum((kj(j) * (nb(j) - m) for j in js[1:]),
              kj(js[0]) * (nb(js[0]) - m))
    det2 = sss * skk - ssk * ssk
    out = out.filter(det2 != F.lit(0.0))
    a = (ssy * skk - ssk * sky) / det2
    b = (sss * sky - ssk * ssy) / det2

    amp = F.sqrt(a * a + b * b)
    phi = F.atan2(b, a)
    two_pi = F.lit(2.0 * math.pi)
    tstar = (F.lit(math.pi / 2.0) - phi) / th  # in samples
    tw = tstar - (two_pi / th) * F.floor(tstar * th / two_pi + F.lit(0.5))
    return out.select(
        *key_cols,
        F.col(ts_col),
        y.alias("peak_raw"),
        # tau twice: as the absolute epoch (API parity with
        # peak_parabola) and as the small-magnitude offset from the
        # raw peak's own timestamp. Downstream comparisons should use
        # the offset — an absolute epoch (~1.7e9 s) rounded to 6
        # decimals is ~16 significant digits, at/beyond double's
        # mantissa, so sub-ulp libm (acos/atan2) differences between
        # engines flip the last digit; the offset is O(period) seconds
        # and ROUND(6) is safely representable (VERDICT r4 #1).
        (ts_s + tw * F.col("__step")).alias("tau_epoch_s"),
        (tw * F.col("__step")).alias("tau_offset_s"),
        (m + amp).alias("peak_fitted"),
    )
