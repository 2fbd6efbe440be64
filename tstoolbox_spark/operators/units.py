"""Unit conversion for value columns (the reference's
``source_units``/``target_units`` surface).

Reference: tsutils.py:1047-1120 (``_normalize_units``) routes every
verb's ``source_units``/``target_units`` through pint, honoring a
``name:unit`` column-suffix convention and raising when an explicit
source unit contradicts a column-embedded one. pint is absent here and
a full unit algebra is out of scope (SURVEY §7.5); what production
time-series pipelines actually convert is a small closed set, and
every member is an affine map. So this module keeps a curated registry
of (dimension, factor, offset)-to-base entries and compiles each
conversion to ONE multiply-add column expression with constants folded
in Python — Catalyst sees a literal ``x * a + b``, which pushes
through codegen, costs nothing, and is bit-reproducible everywhere
(the property the oracle checks). Unknown units and cross-dimension
conversions raise ValueError naming the offending token, like the
reference's pint errors.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

#: unit -> (dimension, factor, offset): value_in_base = x*factor + offset
_REGISTRY: dict[str, tuple[str, float, float]] = {
    # length (base m)
    "m": ("length", 1.0, 0.0), "cm": ("length", 0.01, 0.0),
    "mm": ("length", 0.001, 0.0), "km": ("length", 1000.0, 0.0),
    "ft": ("length", 0.3048, 0.0), "in": ("length", 0.0254, 0.0),
    "mi": ("length", 1609.344, 0.0),
    # flow (base m**3/s)
    "m3/s": ("flow", 1.0, 0.0), "cms": ("flow", 1.0, 0.0),
    "cfs": ("flow", 0.028316846592, 0.0),
    "ft3/s": ("flow", 0.028316846592, 0.0),
    "l/s": ("flow", 0.001, 0.0), "gpm": ("flow", 6.30901964e-05, 0.0),
    # volume (base m**3)
    "m3": ("volume", 1.0, 0.0), "l": ("volume", 0.001, 0.0),
    "ft3": ("volume", 0.028316846592, 0.0),
    "gal": ("volume", 0.003785411784, 0.0),
    "acre_ft": ("volume", 1233.48183754752, 0.0),
    # time (base s)
    "s": ("time", 1.0, 0.0), "min": ("time", 60.0, 0.0),
    "h": ("time", 3600.0, 0.0), "d": ("time", 86400.0, 0.0),
    # temperature (base K) — the affine members
    "k": ("temperature", 1.0, 0.0),
    "degk": ("temperature", 1.0, 0.0),
    "degc": ("temperature", 1.0, 273.15),
    "degf": ("temperature", 5.0 / 9.0, 459.67 * 5.0 / 9.0),
    # mass (base kg)
    "kg": ("mass", 1.0, 0.0), "g": ("mass", 0.001, 0.0),
    "lb": ("mass", 0.45359237, 0.0),
    # depth rate (base m/s) — precip/evap
    "mm/d": ("depth_rate", 0.001 / 86400.0, 0.0),
    "in/d": ("depth_rate", 0.0254 / 86400.0, 0.0),
    "mm/h": ("depth_rate", 0.001 / 3600.0, 0.0),
    # dimensionless
    "": ("dimensionless", 1.0, 0.0),
    "pct": ("dimensionless", 0.01, 0.0),
}


def _lookup(unit: str) -> tuple[str, float, float]:
    key = unit.strip().lower().replace("^", "").replace("**", "")
    try:
        return _REGISTRY[key]
    except KeyError:
        raise ValueError(
            f"unknown unit {unit!r} (curated registry; the reference "
            f"accepts arbitrary pint units — see operators/units.py "
            f"for supported set)"
        ) from None


def conversion_coeffs(source: str, target: str) -> tuple[float, float]:
    """(a, b) such that target_value = x*a + b, folded in Python so
    the plan carries two literals."""
    dim_s, fs, os_ = _lookup(source)
    dim_t, ft, ot = _lookup(target)
    if dim_s != dim_t:
        raise ValueError(
            f"cannot convert {source!r} ({dim_s}) to {target!r} ({dim_t})"
        )
    return fs / ft, (os_ - ot) / ft


def convert_units(
    df: DataFrame,
    source_units: Sequence[str | None],
    target_units: Sequence[str | None],
    value_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Convert each value column from its source to its target unit;
    one multiply-add per column.

    Column names may embed units as ``name:unit`` (ref tsutils.py
    table at :1052-1071): an embedded unit with a DIFFERENT explicit
    source_unit raises ValueError; a None/'' source falls back to the
    embedded unit. Converted columns are renamed ``name:target``.
    Entries where target is None/'' pass through untouched."""
    if value_cols is None:
        value_cols = [c for c in df.columns if c != ts_col]
    if len(source_units) == 1 and len(value_cols) > 1:
        source_units = list(source_units) * len(value_cols)
    if len(target_units) == 1 and len(value_cols) > 1:
        target_units = list(target_units) * len(value_cols)
    if len(source_units) != len(value_cols) or len(target_units) != len(value_cols):
        raise ValueError(
            f"source_units/target_units must match the {len(value_cols)} "
            "value columns (or be a single unit applied to all)"
        )
    out = df
    for col, src, tgt in zip(value_cols, source_units, target_units):
        name, embedded = (col.split(":", 1) + [None])[:2] if ":" in col else (col, None)
        if embedded is not None and src not in (None, "", embedded):
            raise ValueError(
                f"column {col!r} embeds unit {embedded!r} but "
                f"source_units says {src!r}"
            )
        src = src or embedded
        if not tgt:
            continue
        if not src:
            raise ValueError(f"no source unit for column {col!r}")
        a, b = conversion_coeffs(src, tgt)
        new = f"{name}:{tgt}" if embedded is not None else col
        expr = F.col(col).cast("double") * F.lit(a) + F.lit(b)
        out = out.withColumn(col, expr)
        if new != col:
            out = out.withColumnRenamed(col, new)
    return out
