"""Deterministic time-axis derivation.

The stored input table keeps exactly the 4-column hinted shape
``(doc_id, tokens, n_tok, source)``; the time axis the rollup tiers
aggregate over is *derived*, not stored: each sequence is pinned to a
second-resolution instant inside a fixed span after the engine epoch,
as a pure function of ``doc_id``. The derivation is a column
expression (xxhash64 + modular arithmetic) so it is identical on any
cluster size and never shuffles.

Reference analog: tstoolbox assumes every row already carries a
DatetimeIndex (/root/reference/tstoolbox/tsutils.py:1208-1209); here
the index is synthesized deterministically per SURVEY.md §7.2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .datagen import EPOCH

#: span of the derived axis: 30 days of seconds
DEFAULT_SPAN_SECONDS = 30 * 24 * 3600


def ts_for_doc(doc_id: Column, span_seconds: int = DEFAULT_SPAN_SECONDS) -> Column:
    """timestamp = EPOCH + (xxhash64(doc_id) mod span) seconds."""
    offset = F.pmod(F.abs(F.xxhash64(doc_id)), F.lit(span_seconds))
    return F.timestamp_seconds(
        F.unix_timestamp(F.lit(EPOCH), "yyyy-MM-dd HH:mm:ss") + offset
    )


def with_time_axis(df: DataFrame, span_seconds: int = DEFAULT_SPAN_SECONDS) -> DataFrame:
    return df.withColumn("ts", ts_for_doc(F.col("doc_id"), span_seconds))
