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
