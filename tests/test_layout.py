"""Z-order layout: key correctness vs a python reference, and the
actual figure of merit — footer min-max data skipping on crossed
range predicates vs a single-column-sorted layout."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstoolbox_spark.pipeline.layout import (
    file_minmax_envelopes,
    files_overlapping,
    morton_interleave,
    quantize,
    with_zorder_key,
    zorder_write,
)

TESTDATA = "/root/testdata/sf0.001"


def _morton_py(qs: list[int], bits: int) -> int:
    out = 0
    k = len(qs)
    for j, q in enumerate(qs):
        for b in range(bits):
            out |= ((q >> b) & 1) << (b * k + j)
    return out


def test_zorder_key_matches_python(spark):
    pdf = pd.DataFrame({
        "x": [0.0, 1.0, 2.5, 7.9, 8.0, -3.0, 99.0],
        "y": [8.0, 0.1, 4.4, 7.0, 2.2, 5.0, -1.0],
    })
    sdf = spark.createDataFrame(pdf)
    bits = 4
    out = with_zorder_key(
        sdf, [("x", 0.0, 8.0), ("y", 0.0, 8.0)], bits=bits
    ).toPandas()

    def qz(v):
        s = int((v - 0.0) / 8.0 * (1 << bits))
        return min(max(s, 0), (1 << bits) - 1)

    exp = [_morton_py([qz(r.x), qz(r.y)], bits) for r in pdf.itertuples()]
    assert out["zkey"].tolist() == exp


def test_quantize_and_interleave_guards(spark):
    with pytest.raises(ValueError, match="hi > lo"):
        quantize("x", 5.0, 5.0)
    with pytest.raises(ValueError, match="columns"):
        morton_interleave([F.lit(1)])
    with pytest.raises(ValueError, match="63"):
        morton_interleave([F.lit(1)] * 4, bits=16)


def test_zorder_pruning_beats_single_column_sort(spark, tmp_path):
    """The layout claim, measured the way a scan planner would: with
    16 output files over (t, v) space, a crossed range predicate
    (narrow t-band AND narrow v-band) must overlap far fewer file
    envelopes under Z-order than under a value-only sort, while the
    pure time-slice query stays prunable too."""
    ev = (
        spark.read.parquet(f"{TESTDATA}/events.parquet")
        .select(
            F.unix_micros(F.col("ts").cast("timestamp")).cast("double").alias("t"),
            F.col("value").cast("double").alias("v"),
        )
        .filter(F.col("v").isNotNull())
    )
    lo_t, hi_t, lo_v, hi_v = ev.agg(
        F.min("t"), F.max("t"), F.min("v"), F.max("v")
    ).first()
    zdf = with_zorder_key(ev, [("t", lo_t, hi_t + 1), ("v", lo_v, hi_v + 1)])
    zpath = str(tmp_path / "zorder")
    zorder_write(zdf, zpath, files=16)
    # control: same data, same file count, sorted by v only
    vpath = str(tmp_path / "vsort")
    ev.repartitionByRange(16, "v").sortWithinPartitions("v").write.parquet(vpath)

    zenv = file_minmax_envelopes(zpath, ["t", "v"])
    venv = file_minmax_envelopes(vpath, ["t", "v"])
    assert len(zenv) == len(venv) == 16

    # Z-order's figure of merit is WORKLOAD BALANCE: a single-column
    # sort prunes its own column perfectly and the orthogonal one not
    # at all; Z-order prunes every dimension it encodes. Mixed
    # workload = one 10% time-band query + one 10% value-band query.
    span_t, span_v = hi_t - lo_t, hi_v - lo_v
    tbox = {"t": (lo_t + 0.45 * span_t, lo_t + 0.55 * span_t)}
    vbox = {"v": (lo_v + 0.45 * span_v, lo_v + 0.55 * span_v)}

    # every query family prunes under z-order ...
    z_t, z_v = files_overlapping(zenv, tbox), files_overlapping(zenv, vbox)
    assert z_t < len(zenv) and z_v < len(zenv)
    # ... while the single-column layout reads EVERYTHING for the
    # orthogonal band (its files each span the full t range)
    assert files_overlapping(venv, tbox) == len(venv)
    # so over the mixed workload z-order reads strictly fewer files
    v_total = files_overlapping(venv, tbox) + files_overlapping(venv, vbox)
    assert z_t + z_v < v_total

    # crossed predicate (both bands at once) stays bounded: at 16
    # files = 2 Z-bits per dim, a 10% x 10% box touches at most a
    # 2x2 block of curve cells
    box = {**tbox, **vbox}
    assert files_overlapping(zenv, box) <= 4
