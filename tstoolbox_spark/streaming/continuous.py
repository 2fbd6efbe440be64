"""Continuous (streaming) tier materialization.

The reference is batch-only (no watermarks, no stateful operators —
SURVEY.md §2.9), and the north rule's continuous aggregates are batch
rollups; this module is the *incremental-ingest* mode of the same 1m
tier: new sequence files appear under a directory, Structured
Streaming folds them into the finest tier with exactly the batch
partial-aggregate schema, so the 1h/1d cascade and all readers are
oblivious to which mode produced the minutes.

Design (Spark-first):
- ``readStream`` file source over the sequence directory (schema
  pinned — streaming requires it).
- Event-time tumbling window of 1 minute + watermark for late data;
  append output mode emits a minute only once its watermark passes —
  the streaming analog of a closed tier bucket.
- Sink = parquet directory with checkpointLocation: exactly-once file
  sink; resume = restart with the same checkpoint (the streaming
  analog of the batch pipeline's snapshot/lineage resume).
- ``trigger(availableNow=True)`` drains what exists then stops, which
  is also how the test drives it deterministically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..timeaxis import with_time_axis

SEQ_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def continuous_rollup(
    spark: SparkSession,
    input_dir: str,
    tier_dir: str,
    checkpoint_dir: str,
    tier: str = "1m",
    watermark: str = "2 minutes",
    key_cols: tuple[str, ...] = ("source",),
    available_now: bool = True,
):
    """Start the streaming 1m rollup; returns the StreamingQuery.

    Output schema matches pipeline.rollup.rollup_base exactly
    (ts, keys, n_tok_sum/count/min/max partials), so
    ``rollup_cascade`` consumes it unchanged.
    """
    unit = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}[tier]
    stream = spark.readStream.schema(SEQ_SCHEMA).parquet(input_dir)
    seq = with_time_axis(stream)
    agg = (
        seq.withWatermark("ts", watermark)
        .groupBy(F.window("ts", unit).alias("w"), *key_cols)
        .agg(
            F.sum("n_tok").alias("n_tok_sum"),
            F.count("n_tok").alias("n_tok_count"),
            F.min("n_tok").alias("n_tok_min"),
            F.max("n_tok").alias("n_tok_max"),
        )
        .select(F.col("w.start").alias("ts"), *key_cols,
                "n_tok_sum", "n_tok_count", "n_tok_min", "n_tok_max")
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", tier_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def continuous_hist(
    spark: SparkSession,
    input_dir: str,
    tier_dir: str,
    checkpoint_dir: str,
    tier: str = "1m",
    watermark: str = "2 minutes",
    key_cols: tuple[str, ...] = ("source",),
    available_now: bool = True,
):
    """Streaming value-count HISTOGRAM partials — the incremental-ingest
    mode of ``pipeline.rollup.hist_base``. Output schema
    (ts, keys, v, cnt) is consumed unchanged by ``hist_cascade`` /
    ``hist_quantiles``, so exact tier percentiles stay available while
    data streams in. State per open bucket is bounded by the value
    domain (|domain| counters), the same bound that makes the batch
    partial composable; append mode + watermark emit a bucket's
    histogram once it closes. Exactly-once via the file-sink
    transaction log, resume via the checkpoint."""
    unit = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}[tier]
    stream = spark.readStream.schema(SEQ_SCHEMA).parquet(input_dir)
    seq = with_time_axis(stream)
    agg = (
        seq.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", unit).alias("w"),
            *key_cols,
            F.col("n_tok").alias("v"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("ts"), *key_cols, "v", "cnt")
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", tier_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def continuous_ingest_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    available_now: bool = True,
):
    """Streaming exact-dedup at ingest: drop sequences whose token
    content was already seen, BEFORE they reach the rollup/codec
    stages — the streaming twin of ``textops.exact_dedup``'s keeper
    selection, applied to the engine's native (doc_id, tokens, n_tok,
    source) table.

    Spark-first shape: the content key is the portable 60-bit md5 of
    the token stream (a pure column expression), and dedup state is
    BOUNDED by the event-time watermark via
    ``dropDuplicatesWithinWatermark`` — at 10^12 sequences an
    unbounded seen-set is impossible, so streaming dedup is windowed
    by construction (two identical sequences arriving farther apart
    than the watermark both pass; the batch exact_dedup pass remains
    the global authority). Exactly-once via the file-sink transaction
    log + checkpoint, like every stage here.
    """
    from ..textops.dedup import md5int

    stream = spark.readStream.schema(SEQ_SCHEMA).parquet(input_dir)
    seq = with_time_axis(stream)
    hashed = seq.withColumn(
        "content_hash",
        md5int(F.concat_ws(",", F.col("tokens").cast("array<string>"))),
    )
    deduped = hashed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
    writer = (
        deduped.drop("content_hash")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def continuous_cascade(
    spark: SparkSession,
    finer_dir: str,
    tier_dir: str,
    checkpoint_dir: str,
    tier: str = "1h",
    watermark: str = "2 hours",
    key_cols: tuple[str, ...] = ("source",),
    available_now: bool = True,
):
    """Materialize a coarser tier (1h/1d) FROM the streaming finer
    tier's parquet output — the streaming twin of
    ``pipeline.rollup.rollup_cascade``.

    The finer tier is itself an append-only stream of watermark-closed
    buckets (each (ts, key) cell emitted exactly once), so the coarse
    tier is just a second streaming window aggregation over those
    partials: sum(sum)/sum(count)/min(min)/max(max) — the identical
    partial-merge exprs as the batch cascade, hence bit-for-bit parity
    on every emitted bucket. Each stage carries its own checkpoint, so
    the whole 1m → 1h → 1d chain is independently resumable and
    exactly-once end-to-end (file source offsets + file-sink
    transaction log per stage).

    The finer tier's static schema is read from ``finer_dir`` (the dir
    exists once the 1m stage has started); a coarse bucket emits when
    the finer stream's event-time watermark passes its end.
    """
    if tier not in ("1h", "1d"):
        raise ValueError(f"cascade tier must be 1h or 1d, got {tier!r}")
    unit = {"1h": "1 hour", "1d": "1 day"}[tier]
    schema = spark.read.parquet(finer_dir).schema
    stream = spark.readStream.schema(schema).parquet(finer_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", unit).alias("w"), *key_cols)
        .agg(
            F.sum("n_tok_sum").alias("n_tok_sum"),
            F.sum("n_tok_count").alias("n_tok_count"),
            F.min("n_tok_min").alias("n_tok_min"),
            F.max("n_tok_max").alias("n_tok_max"),
        )
        .select(F.col("w.start").alias("ts"), *key_cols,
                "n_tok_sum", "n_tok_count", "n_tok_min", "n_tok_max")
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", tier_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def continuous_cms(
    spark: SparkSession,
    input_dir: str,
    tier_dir: str,
    checkpoint_dir: str,
    tier: str = "1m",
    key_col: str = "doc_id",
    watermark: str = "2 minutes",
    depth: int | None = None,
    width: int | None = None,
    available_now: bool = True,
):
    """Streaming count-min-sketch partials — the incremental-ingest
    mode of ``pipeline.cms.cms_partials``: per closed tier bucket,
    the (j, bucket) counter grid for an UNBOUNDED key domain (doc
    ids at 10^12-sequence scale). Output schema (ts, j, bucket, cnt)
    is consumed unchanged by ``cms_merge`` / ``cms_estimate``, so
    approximate heavy-hitter counts stay available while data streams
    in.

    State per open bucket is bounded by depth × width counters — the
    same bound that makes the batch partial composable; append mode +
    watermark emit a bucket's grid once it closes. Exactly-once via
    the file-sink transaction log, resume via the checkpoint.
    """
    from ..pipeline.cms import CMS_DEPTH, CMS_WIDTH, cms_bucket

    d = depth or CMS_DEPTH
    w = width or CMS_WIDTH
    unit = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}[tier]
    stream = spark.readStream.schema(SEQ_SCHEMA).parquet(input_dir)
    seq = with_time_axis(stream)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                cms_bucket(F.col(key_col), j, w).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    rows = seq.select("ts", F.explode(pairs).alias("jb"))
    agg = (
        rows.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", unit).alias("w"),
            F.col("jb.j").alias("j"),
            F.col("jb.bucket").alias("bucket"),
        )
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("ts"), "j", "bucket", "cnt")
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", tier_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def continuous_bloom(
    spark: SparkSession,
    input_dir: str,
    tier_dir: str,
    checkpoint_dir: str,
    tier: str = "1m",
    key_col: str = "doc_id",
    watermark: str = "2 minutes",
    k: int | None = None,
    words: int | None = None,
    available_now: bool = True,
):
    """Streaming Bloom-filter partials — the incremental-ingest mode
    of ``pipeline.bloom.bloom_build``: per closed tier bucket, the
    (word, mask) table of ids seen in that bucket. ``bloom_merge``
    folds any set of buckets into one filter (bit_or), so "was this
    id ingested in range X" membership stays answerable while data
    streams in — the ingest-side half of eval-set decontamination.

    State per open bucket is bounded by the word-table size;
    exactly-once via the file-sink log, resume via the checkpoint.
    """
    from ..pipeline.bloom import BLOOM_K, BLOOM_WORDS, _exploded_positions

    kk = k or BLOOM_K
    ww = words or BLOOM_WORDS
    unit = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}[tier]
    stream = spark.readStream.schema(SEQ_SCHEMA).parquet(input_dir)
    seq = with_time_axis(stream)
    rows = _exploded_positions(
        seq.select("ts", key_col), key_col, kk, ww, carry_cols=("ts",)
    )
    agg = (
        rows.withWatermark("ts", watermark)
        .groupBy(F.window("ts", unit).alias("w"), F.col("word"))
        .agg(F.bit_or("mask").alias("mask"))
        .select(F.col("w.start").alias("ts"), "word", "mask")
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", tier_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def continuous_phll(
    spark: SparkSession,
    input_dir: str,
    tier_dir: str,
    checkpoint_dir: str,
    tier: str = "1m",
    key_col: str = "doc_id",
    watermark: str = "2 minutes",
    available_now: bool = True,
):
    """Streaming portable-HLL register partials — the incremental-
    ingest mode of ``pipeline.hll.phll_partial``: per closed tier
    bucket, the sparse (idx, rho) register relation for the ids seen
    in that bucket. ``phll_cascade`` folds any set of buckets
    (register-wise MAX, idempotent — safe under replay), so "distinct
    ids ingested in range X" stays answerable while data streams in,
    at ≤256 rows of state per open bucket whatever the id cardinality.

    Exactly-once via the file-sink transaction log, resume via the
    checkpoint — identical contract to the CMS/Bloom ingest twins.
    """
    from ..pipeline.hll import phll_register_rows

    unit = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}[tier]
    stream = spark.readStream.schema(SEQ_SCHEMA).parquet(input_dir)
    seq = with_time_axis(stream)
    rows = phll_register_rows(
        seq.select("ts", key_col), key_col, carry_cols=("ts",)
    )
    agg = (
        rows.withWatermark("ts", watermark)
        .groupBy(F.window("ts", unit).alias("w"), F.col("idx"))
        .agg(F.max("rho").alias("rho"))
        .select(F.col("w.start").alias("ts"), "idx", "rho")
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", tier_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
