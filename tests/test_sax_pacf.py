"""pacf (Durbin-Levinson parity) and SAX words vs numpy references."""

from __future__ import annotations

import datetime as dt
import math
import random

import numpy as np
import pandas as pd
import pytest

from tstoolbox_spark.operators.signal import sax_breakpoints, sax_daily
from tstoolbox_spark.operators.stats import pacf


def np_acf(x, k):
    d = x - x.mean()
    den = (d * d).sum()
    return float((d[k:] * d[:-k]).sum() / den)


def np_pacf(x, max_lag):
    r = [1.0] + [np_acf(x, k) for k in range(1, max_lag + 1)]
    phi = {(1, 1): r[1]}
    out = [r[1]]
    for k in range(2, max_lag + 1):
        num = r[k] - sum(phi[(k - 1, j)] * r[k - j] for j in range(1, k))
        den = 1 - sum(phi[(k - 1, j)] * r[j] for j in range(1, k))
        pkk = num / den
        out.append(pkk)
        for j in range(1, k):
            phi[(k, j)] = phi[(k - 1, j)] - pkk * phi[(k - 1, k - j)]
        phi[(k, k)] = pkk
    return out


def test_pacf_matches_durbin_levinson(spark):
    rng = random.Random(7)
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=i) for i in range(200)]
    # AR(2)-ish series so pacf(3) is non-trivial
    x = [0.0, 0.0]
    for _ in range(198):
        x.append(0.6 * x[-1] - 0.3 * x[-2] + rng.gauss(0, 1))
    pdf = pd.DataFrame({"ts": ts, "value": x})
    out = pacf(spark.createDataFrame(pdf), "value", max_lag=3).collect()
    got = {r["lag"]: r["pacf"] for r in out}
    exp = np_pacf(np.array(x), 3)
    for k in (1, 2, 3):
        # quantized ACF sums → agreement to ~1e-4 vs the float reference
        assert got[k] == pytest.approx(exp[k - 1], abs=5e-4), k


def test_pacf_lag_bounds(spark):
    pdf = pd.DataFrame(
        {"ts": [dt.datetime(2024, 1, 1)], "value": [1.0]}
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError):
        pacf(df, "value", max_lag=4)


def test_sax_breakpoints_standard_table():
    bps = sax_breakpoints(4)
    # classic SAX table for a=4: ±0.6745, 0
    assert bps[1] == pytest.approx(0.0, abs=1e-12)
    assert bps[0] == pytest.approx(-0.6745, abs=1e-4)
    assert bps[2] == pytest.approx(0.6745, abs=1e-4)
    with pytest.raises(ValueError):
        sax_breakpoints(1)


def np_sax_daily(pdf, segments, alphabet):
    x = pdf["value"].to_numpy(dtype=float)
    mu = np.floor(x * 1e6 + 0.5).sum() / len(x) / 1e6
    d = x - mu
    den = np.floor(d * d * 1e6 + 0.5).sum()
    z = d / math.sqrt(den / 1e6 / len(x)) if den > 0 else np.zeros_like(d)
    pdf = pdf.assign(z=z, day=pdf["ts"].dt.floor("D"),
                     seg=(pdf["ts"].dt.hour * segments // 24))
    bps = sax_breakpoints(alphabet)
    words = {}
    for day, g in pdf.groupby("day"):
        paa = g.groupby("seg")["z"].apply(
            lambda s: np.floor(s * 1e6 + 0.5).sum() / len(s) / 1e6
        )
        syms = ["abcdefghij"[int(sum(p > b for b in bps))] for p in paa.sort_index()]
        words[day.to_pydatetime()] = "".join(syms)
    return words


def test_sax_daily_matches_numpy(spark):
    rng = random.Random(3)
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=i) for i in range(96)]
    vals = [math.sin(i / 5) * 3 + rng.gauss(0, 0.5) for i in range(96)]
    pdf = pd.DataFrame({"ts": ts, "value": vals})
    out = sax_daily(spark.createDataFrame(pdf), "value", segments=8, alphabet=4)
    got = {r["day"]: r["sax_word"] for r in out.collect()}
    exp = np_sax_daily(pdf, 8, 4)
    assert got == exp


def test_sax_daily_constant_series(spark):
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(hours=i) for i in range(24)]
    pdf = pd.DataFrame({"ts": ts, "value": [5.0] * 24})
    out = sax_daily(spark.createDataFrame(pdf), "value", segments=4, alphabet=4).collect()
    # zero variance → z = 0 → symbol 'b' (first bucket above the ≤0 breakpoints)
    assert len(out) == 1 and set(out[0]["sax_word"]) == {"b"}
