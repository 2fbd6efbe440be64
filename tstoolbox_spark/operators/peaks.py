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
