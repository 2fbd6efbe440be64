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


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score each raw
    document by how much more likely its hashed-unigram features are
    under a TARGET corpus than under the RAW corpus,

        log w(x) = Σ_b c_b(x) · ( ln p̂_target(b) − ln p̂_raw(b) ),

    with add-1-smoothed bucket probabilities over ``n_buckets`` hashed
    word buckets.  High-weight documents are the ones to up-sample
    (pair with ``hash_sample``/``mixture_sample`` for the resample
    step).

    Scale shape: two map-side-combined bucket histograms (target and
    raw — n_buckets rows each, metadata scale), broadcast-joined onto
    per-document bucket counts; one explode + one groupBy(doc) shuffle
    over the corpus.  Every document bucket exists in the raw
    histogram by construction, so no smoothing fallback join is
    needed on the doc side.

    Hash-stability: each per-bucket term is floor-quantized to 1e-6
    BEFORE the per-document sum, so the output ``logw_q6`` (the weight
    in millionths) is a BIGINT — association-order-free and
    bit-reproducible across engines.  Divide by 1e6 for the float
    weight.
    """
    feat = lambda c: (md5int(c) % n_buckets).cast("int")  # noqa: E731
    from .dedup import words

    def bucket_counts(frame: DataFrame) -> DataFrame:
        return (
            frame.select(F.explode(words(F.col(text_col))).alias("w"))
            .select(feat(F.col("w")).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    tgt = bucket_counts(target)
    raw = bucket_counts(df)
    t_total = tgt.agg(F.sum("cnt")).collect()[0][0] or 0
    r_total = raw.agg(F.sum("cnt")).collect()[0][0] or 0
    ratio = (
        raw.alias("r")
        .join(tgt.alias("t"), "b", "left")
        .select(
            "b",
            (
                F.log((F.coalesce(F.col("t.cnt"), F.lit(0)) + 1).cast("double")
                      / F.lit(float(t_total + n_buckets)))
                - F.log((F.col("r.cnt") + 1).cast("double")
                        / F.lit(float(r_total + n_buckets)))
            ).alias("lr"),
        )
    )
    doc_buckets = (
        df.select(id_col, F.explode(words(F.col(text_col))).alias("w"))
        .select(id_col, feat(F.col("w")).alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        doc_buckets.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("int").alias("n_words"),
            F.sum(F.floor(F.col("c") * F.col("lr") * 1e6)).cast("long").alias("logw_q6"),
        )
    )


def assign_split(
    df: DataFrame,
    fractions: Mapping[str, float],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test (or any named) corpus split: each
    row's ticket falls into consecutive [0, SAMPLE_MOD) ranges sized by
    ``fractions`` (insertion order; must sum to ≤ 1 — any remainder
    gets the last split).  The split is a pure function of the row id:
    re-runs, repartitioning, adding executors, or growing the corpus
    never move a document between splits (the property leakage-safe
    eval splits require).  A narrow projection — no shuffle, no RNG.
    """
    total = sum(fractions.values())
    if not fractions or total > 1.0 + 1e-9:
        raise ValueError(f"fractions must be non-empty and sum to <= 1, got {total}")
    ticket = sample_ticket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cut = F.lit(int(round(acc * SAMPLE_MOD)))
        branch = F.when(ticket < cut, F.lit(name))
        expr = branch if expr is None else expr.when(ticket < cut, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)
