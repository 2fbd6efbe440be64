"""Multi-dimensional file layout: Z-order (Morton) clustering.

A 100 TB table sorted by timestamp alone serves time-range queries
well and everything else badly: a predicate on a second column (value
band, user bucket, source) overlaps essentially EVERY file's min-max
envelope, so footer-level data skipping prunes nothing. Z-ordering
interleaves the bits of several quantized columns into one sort key,
giving every file a tight hyper-rectangle envelope in ALL the encoded
dimensions at once — the standard warehouse layout trick (Morton 1966;
the same scheme Delta/Iceberg expose as ``OPTIMIZE ... ZORDER BY``).

Everything here is exact integer column arithmetic (quantize →
shift/or interleave), so the key is engine-reproducible: the driver
query's DuckDB oracle rebuilds it bit-for-bit with the same shifts.

Usage::

    zdf = with_zorder_key(df, [("ts_us", lo_t, hi_t), ("value", lo_v, hi_v)])
    zorder_write(zdf, path, files=64)        # range-partition + sort by zkey

At scale: ``repartitionByRange(zkey)`` is one shuffle at write time
(amortized over every later read); each output file then covers a
contiguous Z-curve segment, i.e. a small box in (t, v) space, and a
conjunctive range predicate prunes all files whose box misses the
query box. The figure of merit is WORKLOAD BALANCE, verified against
parquet footer min-max stats in tests/test_layout.py: a single-column
sort prunes its own column perfectly and the orthogonal one not at
all (every file spans the full range of the other dimension); Z-order
prunes every encoded dimension, so a mixed time-band + value-band
workload reads strictly fewer files, and crossed boxes stay bounded
by the curve-cell geometry.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default bits per dimension; k dims * bits must stay < 63 (BIGINT)
ZBITS = 16


def quantize(col: Column | str, lo: float, hi: float, bits: int = ZBITS) -> Column:
    """Map ``col`` affinely from [lo, hi] onto the integer grid
    [0, 2^bits - 1], clamping out-of-range values to the edges (floor
    of the scaled position — the conventional fixed-grid quantizer).
    ``lo``/``hi`` come from profile stats (or partition min/max) and
    are part of the layout's identity: readers never need them, only
    writers do."""
    if hi <= lo:
        raise ValueError(f"quantize needs hi > lo, got [{lo}, {hi}]")
    c = F.col(col) if isinstance(col, str) else col
    top = (1 << bits) - 1
    scaled = F.floor(
        (c.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(1 << bits))
    ).cast("long")
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(top))


def morton_interleave(cols: list[Column], bits: int = ZBITS) -> Column:
    """Bit-interleave k already-quantized integer columns into one
    Z-order key: output bit ``b*k + j`` is bit ``b`` of column ``j``
    (column 0 in the least-significant lane). Pure shift/and/or
    terms with literal shift amounts — stays inside whole-stage
    codegen (k*bits individual tiny terms, nowhere near the janino
    method limit for the supported k*bits < 63)."""
    k = len(cols)
    if k < 2:
        raise ValueError("morton_interleave needs >= 2 columns")
    if k * bits >= 63:
        raise ValueError(
            f"{k} dims x {bits} bits = {k * bits} key bits; must be < 63 "
            "to fit a BIGINT — lower bits per dimension"
        )
    terms = []
    for j, c in enumerate(cols):
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + j)
            )
    return reduce(lambda a, t: a.bitwiseOR(t), terms).alias("zkey")


def with_zorder_key(
    df: DataFrame,
    dims: list[tuple[str, float, float]],
    bits: int = ZBITS,
    out_col: str = "zkey",
) -> DataFrame:
    """Append the Z-order key built from ``dims`` =
    [(column, lo, hi), ...]."""
    qs = [quantize(name, lo, hi, bits) for name, lo, hi in dims]
    return df.withColumn(out_col, morton_interleave(qs, bits))


def zorder_write(
    df: DataFrame,
    path: str,
    files: int = 64,
    key_col: str = "zkey",
    drop_key: bool = True,
) -> None:
    """Lay ``df`` out as ``files`` parquet files, each covering one
    contiguous Z-curve segment: range-partition on the key (one
    shuffle; AQE-friendly, skew impossible because the key is a
    permutation of a dense grid) and sort within partitions so parquet
    row-group stats are tight too. The key column itself is dropped by
    default — the layout, not the key, is the product."""
    ranged = df.repartitionByRange(files, F.col(key_col)).sortWithinPartitions(
        key_col
    )
    if drop_key:
        ranged = ranged.drop(key_col)
    ranged.write.mode("overwrite").parquet(path)


def file_minmax_envelopes(path: str, cols: list[str]):
    """Footer-only scan: per parquet file, the (min, max) envelope of
    each requested column — exactly the statistics a warehouse scan
    planner consults for data skipping. Returns
    ``[{file, <col>_min, <col>_max, ...}, ...]``. Driver-side and
    metadata-bounded (one footer per file)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        env: dict = {"file": os.path.basename(f)}
        for ci in range(md.num_columns):
            name = md.row_group(0).column(ci).path_in_schema
            if name not in cols:
                continue
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    mins, maxs = [], []
                    break
                mins.append(st.min)
                maxs.append(st.max)
            env[f"{name}_min"] = min(mins) if mins else None
            env[f"{name}_max"] = max(maxs) if maxs else None
        out.append(env)
    return out


def files_overlapping(envelopes, box: dict[str, tuple]) -> int:
    """How many files a conjunctive range predicate must read: count
    envelopes intersecting ``box`` = {col: (lo, hi)}. The skipping
    ratio len(envelopes)/files_overlapping is the layout's figure of
    merit for that query shape."""
    n = 0
    for env in envelopes:
        hit = True
        for c, (lo, hi) in box.items():
            cmin, cmax = env.get(f"{c}_min"), env.get(f"{c}_max")
            if cmin is None or cmax is None:
                continue  # no stats -> cannot skip, counts as read
            if cmax < lo or cmin > hi:
                hit = False
                break
        n += hit
    return n
