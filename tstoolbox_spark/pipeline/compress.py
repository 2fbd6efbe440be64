"""Compress / decompress stages: Gorilla bucket codec inside
applyInPandas (Arrow-vectorized grouped map — the only Python stage in
the pipeline, as the north rule mandates).

compress: (doc_id, tokens, n_tok, source, ts, bucket, salt) grouped by
(source, bucket, salt) → one row per cell:
(source, bucket, salt, n_rows, n_tokens, raw_bytes, blob).

decompress: inverse, exploding blobs back to sequence rows. Round-trip
token equality is the enforced invariant (verify_roundtrip).

Scale notes: each cell is sized by bucketing.py to a bounded row count
so the pandas frame fits worker memory; Arrow batches move columns
zero-copy-ish; token arrays are flattened into one contiguous int64
stream before hitting numpy (no per-row Python loops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec.gorilla import decode_bucket, encode_bucket

COMPRESSED_SCHEMA = (
    "source string, bucket int, salt int, n_rows long, n_tokens long, "
    "raw_bytes long, blob binary"
)

SEQUENCE_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, "
    "ts timestamp, bucket int, salt int"
)


def _encode_cell(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "doc_id"])
    ts = pdf["ts"].to_numpy(dtype="datetime64[us]").view(np.int64)
    n_tok = pdf["n_tok"].to_numpy(dtype=np.int64)
    # flatten token arrays into one contiguous stream (vectorized concat)
    tokens_flat = (
        np.concatenate(pdf["tokens"].to_numpy())
        if len(pdf)
        else np.zeros(0, dtype=np.int64)
    ).astype(np.int64, copy=False)
    doc_ids = pdf["doc_id"].tolist()
    blob = encode_bucket(ts, n_tok, tokens_flat, doc_ids)
    raw = len(pdf) * 16 + tokens_flat.size * 4 + sum(len(d) for d in doc_ids)
    return pd.DataFrame(
        {
            "source": [pdf["source"].iloc[0]],
            "bucket": [pdf["bucket"].iloc[0]],
            "salt": [pdf["salt"].iloc[0]],
            "n_rows": [len(pdf)],
            "n_tokens": [int(tokens_flat.size)],
            "raw_bytes": [raw],
            "blob": [blob],
        }
    )


def compress(bucketed_df: DataFrame) -> DataFrame:
    """One compressed row per (source, bucket, salt) cell."""
    return bucketed_df.groupBy("source", "bucket", "salt").applyInPandas(
        _encode_cell, schema=COMPRESSED_SCHEMA
    )


def _decode_cell(it):
    for pdf in it:
        for row in pdf.itertuples(index=False):
            ts, n_tok, tokens_flat, doc_ids = decode_bucket(bytes(row.blob))
            ends = np.cumsum(n_tok)
            starts = ends - n_tok
            tok32 = tokens_flat.astype(np.int32, copy=False)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "tokens": [tok32[s:e] for s, e in zip(starts, ends)],
                    "n_tok": n_tok.astype(np.int32),
                    "source": row.source,
                    "ts": pd.to_datetime(ts, unit="us"),
                    "bucket": np.int32(row.bucket),
                    "salt": np.int32(row.salt),
                }
            )


def decompress(compressed_df: DataFrame) -> DataFrame:
    """Explode compressed cells back to sequence rows (mapInPandas —
    each input row is independent; no shuffle)."""
    return compressed_df.mapInPandas(_decode_cell, schema=SEQUENCE_SCHEMA)


def verify_roundtrip(bucketed_df: DataFrame, decompressed_df: DataFrame) -> dict:
    """North-rule invariant: per-row token-array equality vs source.

    Join on doc_id (co-partitioned: both sides hash the same key) and
    compare arrays JVM-side (no Python). Returns counts; mismatched==0
    is the gate.
    """
    left = bucketed_df.select("doc_id", F.col("tokens").alias("tokens_src"))
    right = decompressed_df.select("doc_id", F.col("tokens").alias("tokens_rt"))
    joined = left.join(right, "doc_id", "full")
    agg = joined.agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(
                F.col("tokens_src").isNull()
                | F.col("tokens_rt").isNull()
                | (F.col("tokens_src") != F.col("tokens_rt")),
                1,
            ).otherwise(0)
        ).alias("mismatched"),
    ).collect()[0]
    return {"total": agg["total"], "mismatched": int(agg["mismatched"] or 0)}
