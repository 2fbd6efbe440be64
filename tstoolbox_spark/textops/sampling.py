"""Deterministic corpus sampling + mixture weighting.

Training-data pipelines rarely take a corpus as-is: they sample it
down and re-weight sources to hit a target mixture (e.g. the
published GPT-3 / Pile mixture tables).  These ops make that step
reproducible and distributed:

- every sample decision is a pure function of the row's id
  (``md5int(id) mod M < fraction·M``) — re-running the job, adding
  executors, or changing partitioning NEVER changes the sample, and
  the same expression runs verbatim in the DuckDB oracle;
- no ``df.sample`` (seeded per-partition RNG → partitioning-dependent
  output, not oracle-checkable, not resumable);
- the only driver-side data is one row per stratum (source counts),
  used to turn target mixture weights into per-source rates.

Scale shape: sampling itself is a narrow filter (no shuffle, pushed
to the scan when ids are parquet columns); ``mixture_rates`` adds one
map-side-combinable count per source.

Reference parity: the reference has no sampler — this is an engine
extension in the spirit of its `pick`/`date_slice` row-subsetting
verbs (tstoolbox/functions/pick.py, date_slice.py) applied to the
documents corpus.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5int

#: modulus for hash→uniform mapping; 2^20 keeps fraction granularity
#: at ~1e-6 while the comparison stays integer-exact in every engine.
SAMPLE_MOD = 1 << 20


def sample_ticket(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform ticket in [0, SAMPLE_MOD) for a row id.

    ``salt`` decorrelates independent sampling stages (e.g. a dev
    holdout drawn after a training sample) — different salts give
    independent tickets for the same id.
    """
    key = F.concat(id_col.cast("string"), F.lit(salt))
    return md5int(key) % F.lit(SAMPLE_MOD)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, decided per-row by
    the id hash. Idempotent and partitioning-independent; a narrow
    filter (no shuffle)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cut = int(round(fraction * SAMPLE_MOD))
    return df.filter(sample_ticket(F.col(id_col), salt) < F.lit(cut))


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction; strata not listed keep ``default_fraction``.

    The per-stratum cutoffs inline as a CASE expression (|strata| is
    mixture-table scale, not data scale), so this stays a single
    narrow filter — no join, no shuffle.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1]")
    cut = F.lit(int(round(default_fraction * SAMPLE_MOD)))
    for k in sorted(fractions):
        cut = F.when(
            F.col(strata_col) == F.lit(k),
            F.lit(int(round(fractions[k] * SAMPLE_MOD))),
        ).otherwise(cut)
    return df.filter(sample_ticket(F.col(id_col), salt) < cut)


def mixture_rates(
    df: DataFrame,
    targets: Mapping[str, float],
    strata_col: str = "source",
) -> dict[str, float]:
    """Turn target mixture *weights* into per-stratum sampling rates.

    Finds the largest output corpus whose composition matches
    ``targets`` (weights are normalized) without up-sampling any
    stratum: total T = min_s(count_s / w_s), rate_s = w_s·T/count_s —
    the binding stratum keeps everything, the rest downsample.
    Driver sees one (stratum, count) row per stratum.
    """
    w_total = float(sum(targets.values()))
    if w_total <= 0:
        raise ValueError("targets must have positive total weight")
    w = {k: v / w_total for k, v in targets.items()}
    counts = {
        r[strata_col]: r["n"]
        for r in df.filter(F.col(strata_col).isin(*w))
        .groupBy(strata_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    missing = [k for k in w if k not in counts]
    if missing:
        raise ValueError(f"strata absent from corpus: {missing}")
    t = min(counts[k] / w[k] for k in w if w[k] > 0)
    return {k: min(1.0, (w[k] * t) / counts[k]) if counts[k] else 0.0 for k in w}


def mixture_sample(
    df: DataFrame,
    targets: Mapping[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministically sample the corpus to a target source mixture
    (see mixture_rates). Strata outside ``targets`` are dropped."""
    rates = mixture_rates(df, targets, strata_col)
    return stratified_sample(
        df, rates, strata_col, id_col, default_fraction=0.0, salt=salt
    )
