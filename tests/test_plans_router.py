"""Tier-router correctness: routed coarse rollups must equal direct
rollups from raw, and must scan the expected (coarsest sufficient)
tier. Plus the date_slice boundary-insertion quirk."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tstoolbox_spark.datagen import generate_sequences
from tstoolbox_spark.operators.core import date_slice
from tstoolbox_spark.pipeline import rollup
from tstoolbox_spark.plans import route_tier_query
from tstoolbox_spark.tables import ParquetSnapshotCatalog
from tstoolbox_spark.timeaxis import with_time_axis


@pytest.fixture(scope="module")
def tiered(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tiers")
    seq = with_time_axis(generate_sequences(spark, 20_000))
    cat = ParquetSnapshotCatalog(str(root))
    m = rollup.rollup_base(seq, "1m", ("source",))
    cat.write_snapshot(m, "tier_1m")
    h = rollup.rollup_cascade(cat.read(spark, "tier_1m"), "1h", ("source",))
    cat.write_snapshot(h, "tier_1h")
    d = rollup.rollup_cascade(cat.read(spark, "tier_1h"), "1d", ("source",))
    cat.write_snapshot(d, "tier_1d")
    return seq, cat


def _direct(seq, secs):
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / secs) * secs
    ).alias("ts")
    return seq.groupBy("source", bucket).agg(
        F.sum("n_tok").alias("n_tok_sum"),
        F.count("n_tok").alias("n_tok_count"),
        F.min("n_tok").alias("n_tok_min"),
        F.max("n_tok").alias("n_tok_max"),
    )


@pytest.mark.parametrize(
    "freq,secs,expected_tier",
    [("6H", 6 * 3600, "1h"), ("90T", 90 * 60, "1m"), ("2D", 2 * 86400, "1d")],
)
def test_routed_equals_direct(spark, tiered, freq, secs, expected_tier):
    seq, cat = tiered
    routed, tier = route_tier_query(spark, cat, freq)
    assert tier == expected_tier
    direct = _direct(seq, secs)
    joined = routed.alias("r").join(direct.alias("d"), ["source", "ts"], "full")
    assert joined.filter(F.col("r.n_tok_sum").isNull() | F.col("d.n_tok_sum").isNull()).count() == 0
    bad = joined.filter(
        (F.col("r.n_tok_sum") != F.col("d.n_tok_sum"))
        | (F.col("r.n_tok_count") != F.col("d.n_tok_count"))
        | (F.col("r.n_tok_min") != F.col("d.n_tok_min"))
        | (F.col("r.n_tok_max") != F.col("d.n_tok_max"))
    )
    assert bad.count() == 0


def test_routed_calendar_month(spark, tiered):
    seq, cat = tiered
    routed, tier = route_tier_query(spark, cat, "M")
    assert tier == "1d"
    direct = seq.groupBy("source", F.date_trunc("month", "ts").alias("ts")).agg(
        F.sum("n_tok").alias("s")
    )
    joined = routed.join(direct, ["source", "ts"])
    assert joined.filter(F.col("n_tok_sum") != F.col("s")).count() == 0


def test_router_rejects_unservable(spark, tiered):
    _, cat = tiered
    with pytest.raises(LookupError):
        route_tier_query(spark, cat, "90S")  # finer than any tier


def test_date_slice_inserts_missing_boundaries(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 01:00", "2024-01-01 02:00"]),
            "value": [1.0, 2.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = date_slice(
        df, "2024-01-01 00:30:00", "2024-01-01 02:30:00", insert_boundaries=True
    ).orderBy("ts")
    rows = out.collect()
    assert len(rows) == 4
    assert rows[0]["ts"].minute == 30 and rows[0]["value"] is None
    assert rows[-1]["ts"].minute == 30 and rows[-1]["value"] is None
    # present boundary is NOT duplicated
    out2 = date_slice(
        df, "2024-01-01 01:00:00", "2024-01-01 02:00:00", insert_boundaries=True
    )
    assert out2.count() == 2


@pytest.fixture(scope="module")
def sketch_tiered(spark, tmp_path_factory):
    """hist_* and phll_* sketch tiers committed next to the value
    tiers — the holistic-aggregate materializations the router serves
    quantile/distinct queries from."""
    from tstoolbox_spark.pipeline.hll import phll_cascade, phll_partial

    root = tmp_path_factory.mktemp("sketch_tiers")
    seq = with_time_axis(generate_sequences(spark, 20_000))
    cat = ParquetSnapshotCatalog(str(root))
    hh = rollup.hist_base(seq, "1h", ("source",))
    cat.write_snapshot(hh, "hist_1h")
    cat.write_snapshot(
        rollup.hist_cascade(cat.read(spark, "hist_1h"), "1d", ("source",)),
        "hist_1d",
    )
    ph = phll_partial(seq, "1h", ("source",), value_col="doc_id")
    cat.write_snapshot(ph, "phll_1h")
    cat.write_snapshot(
        phll_cascade(cat.read(spark, "phll_1h"), "1d", ("source",)),
        "phll_1d",
    )
    return seq, cat


def test_routed_quantiles_equal_direct(spark, sketch_tiered):
    """6H quantiles served from the 1h hist tier must equal exact
    percentile_disc over raw rows."""
    from tstoolbox_spark.plans import route_quantile_query

    seq, cat = sketch_tiered
    routed, tier = route_quantile_query(spark, cat, "6H", qs=(0.5, 0.9))
    assert tier == "1h"
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / (6 * 3600)) * (6 * 3600)
    ).alias("ts")
    direct = seq.groupBy("source", bucket).agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tok)").alias("p50"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_tok)").alias("p90"),
    )
    j = routed.alias("r").join(direct.alias("d"), ["source", "ts"], "full")
    assert j.filter(F.col("r.p50").isNull() | F.col("d.p50").isNull()).count() == 0
    assert (
        j.filter(
            (F.col("r.p50") != F.col("d.p50"))
            | (F.col("r.p90") != F.col("d.p90"))
        ).count()
        == 0
    )


def test_routed_distinct_matches_sketch_and_bounds(spark, sketch_tiered):
    """2D distinct served from the phll_1d tier must equal building
    the sketch straight from raw rows at that grid (register-MAX
    losslessness through the catalog roundtrip), and sit within the
    sketch error of exact."""
    from tstoolbox_spark.pipeline.hll import phll_estimate, phll_partial
    from tstoolbox_spark.plans import route_distinct_query

    seq, cat = sketch_tiered
    routed, tier = route_distinct_query(spark, cat, "2D")
    assert tier == "1d"
    secs = 2 * 86400
    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp("ts") / secs) * secs
    ).alias("ts")
    direct = phll_estimate(
        phll_partial(
            seq.select("source", bucket, "doc_id"),
            "1m",  # ts already floored to the 2D grid; 1m trunc is identity
            ("source",),
            value_col="doc_id",
        ),
        key_cols=("source",),
    )
    assert routed.exceptAll(direct).count() == 0
    assert direct.exceptAll(routed).count() == 0
    exact = seq.groupBy("source", bucket).agg(
        F.countDistinct("doc_id").alias("n")
    )
    j = routed.join(exact, ["source", "ts"])
    bad = j.filter(
        F.abs(F.col("approx_distinct") - F.col("n")) / F.col("n") > 0.2
    )
    assert bad.count() == 0


def test_route_quantile_prefers_coarsest(spark, sketch_tiered):
    from tstoolbox_spark.plans import route_distinct_query, route_quantile_query

    _, cat = sketch_tiered
    assert route_quantile_query(spark, cat, "2D")[1] == "1d"
    assert route_distinct_query(spark, cat, "6H")[1] == "1h"
    with pytest.raises(LookupError):
        route_quantile_query(spark, cat, "90T")  # no hist_1m committed
    with pytest.raises(LookupError):
        route_distinct_query(spark, cat, "45T")
