"""CSV time-series source/sink with the reference's ingestion
semantics, Spark-first.

Reference: /root/reference/tstoolbox/tsutils.py:1745-1926
(``read_iso_ts``) — separator sniffing, optional header, whitespace
cells → NaN, duplicate column-name dedup, gzip/bz2 transparency,
first column = datetime index; and tsutils.py:1555-1634 (``printiso``)
— CSV out with ``float_format='g'`` and the index named ``Datetime``.

Spark mapping: ``spark.read.csv`` already handles compression codecs,
headers, and distributed parsing; the reference quirks are layered as
column expressions (trim-to-null, double casts, timestamp parse), so
ingestion stays a single pushdown-friendly scan — no driver-side
parsing beyond a one-line separator sniff.
"""

from __future__ import annotations

import gzip
import io
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SEPS = [",", "\t", ";", "|"]

# hard cap for the path=None inline-text sink modes: beyond this, the
# caller must use the distributed directory writers.
_MAX_INLINE_ROWS = 100_000


def _sniff_sep(path: str) -> str:
    """Pick the candidate separator with the most splits on the first
    line (reference: pandas ``sep=None`` engine sniffing,
    tsutils.py:1842-1855). One small driver-side read — metadata
    scale, not data scale."""
    first = path.split(",")[0]
    opener = gzip.open if first.endswith(".gz") else open
    try:
        with opener(first, "rb") as f:
            line = io.TextIOWrapper(f, errors="replace").readline()
    except (OSError, IsADirectoryError):
        # directory of part files — sniff the first part
        parts = [p for p in os.listdir(first) if not p.startswith(("_", "."))]
        if not parts:
            return ","
        return _sniff_sep(os.path.join(first, sorted(parts)[0]))
    counts = {s: line.count(s) for s in _SEPS}
    best = max(counts, key=counts.get)
    return best if counts[best] > 0 else ","


#: lenient timestamp formats tried IN ORDER after the ISO parse (the
#: reference's dateparser fallback, tsutils.py:606-641). Ambiguous
#: xx/xx dates resolve month-first (the pandas/dateparser default);
#: documented, not configurable — pass pre-parsed timestamps for
#: other locales.
_LENIENT_TS_FORMATS = (
    "yyyy/MM/dd HH:mm:ss",
    "yyyy/MM/dd HH:mm",
    "yyyy/MM/dd",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy HH:mm",
    "MM/dd/yyyy",
    "dd.MM.yyyy HH:mm:ss",
    "dd.MM.yyyy",
    "MMM d, yyyy HH:mm:ss",
    "MMM d, yyyy",
    "d MMM yyyy HH:mm:ss",
    "d MMM yyyy",
)

_URL_SCHEMES = ("http://", "https://", "ftp://", "file://")


def _fetch_url(path: str) -> str:
    """Reference parity (tsutils.py:606-641: read_iso_ts accepts
    URLs): download to a temp file on the driver and read that. A
    URL source is inherently single-stream — fine for the CLI/fixture
    surface this serves; at scale the input is parquet on shared
    storage, never a URL."""
    import tempfile
    import urllib.request

    suffix = ".csv.gz" if path.endswith(".gz") else ".csv"
    with urllib.request.urlopen(path) as r:  # noqa: S310 (explicit opt-in surface)
        data = r.read()
    f = tempfile.NamedTemporaryFile("wb", suffix=suffix, delete=False)
    f.write(data)
    f.close()
    return f.name


def read_timeseries_csv(
    spark: SparkSession,
    path: str,
    sep: str | None = None,
    header: bool = True,
    skiprows: int = 0,
    ts_col: str = "ts",
    index_type: str = "datetime",
) -> DataFrame:
    """Read CSV/TSV into the engine's long-form shape: ``ts`` timestamp
    (or ``idx`` double for ``index_type='number'``) + double value
    columns. Whitespace-only cells become null (tsutils.py:1830-1835).
    URLs (http/https/ftp/file) download to a temp file first; fuzzy
    timestamp formats fall back through ``_LENIENT_TS_FORMATS`` after
    the ISO parse.
    """
    if path.startswith(_URL_SCHEMES):
        path = _fetch_url(path)
    sep = sep or _sniff_sep(path)
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .option("comment", "#")
    )
    # duplicate header names: Spark's CSV reader dedups them itself
    # (a, a1, a2 — same disambiguation the reference does pandas-style
    # as a, a.1, a.2; suffix shape differs, role identical)
    df = reader.csv(path)
    if skiprows:
        # header already consumed; drop the next `skiprows` physical rows
        from pyspark.sql.window import Window

        w = Window.orderBy(F.monotonically_increasing_id())
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") > skiprows)
            .drop("__rn")
        )
    names = df.columns
    first, rest = names[0], names[1:]
    blank_to_null = lambda c: F.when(F.trim(F.col(c)) == "", None).otherwise(  # noqa: E731
        F.trim(F.col(c))
    )
    if index_type == "datetime":
        raw = blank_to_null(first)
        idx = F.coalesce(
            F.try_to_timestamp(raw),
            *[F.try_to_timestamp(raw, F.lit(fmt))
              for fmt in _LENIENT_TS_FORMATS],
        ).alias(ts_col)
    elif index_type == "number":
        idx = blank_to_null(first).cast("double").alias("idx")
    else:
        raise ValueError(f"unknown index_type {index_type!r}")
    values = [blank_to_null(c).cast("double").alias(c) for c in rest]
    return df.select(idx, *values)


def write_iso_csv(
    df: DataFrame,
    path: str | None = None,
    ts_col: str = "ts",
    single_file: bool = False,
) -> str | None:
    """printiso sink: CSV with the time column first, named
    ``Datetime`` (tsutils.py:1604-1617). With ``path=None`` returns the
    CSV text (test/driver scale only — collects); with a path, writes a
    distributed CSV directory (``single_file=True`` coalesces to one
    part for tool interop — driver-scale outputs only)."""
    if ts_col in df.columns:
        cols = [
            F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss").alias("Datetime")
        ] + [F.col(c) for c in df.columns if c != ts_col]
        out = df.select(*cols).orderBy("Datetime")
    else:
        # aggregate verbs (gof, describe, theil_sen, ar2, ...) emit no
        # time column; print as-is, ordered by every column so the text
        # is deterministic
        out = df.orderBy(*df.columns)
    if path is None:
        # inline-text mode funnels through the driver by design (fixture
        # exports, doctest parity) — bound it so a tier table pointed
        # here fails fast instead of OOMing the driver.
        pdf = out.limit(_MAX_INLINE_ROWS + 1).toPandas()
        if len(pdf) > _MAX_INLINE_ROWS:
            raise ValueError(
                f"write_iso_csv(path=None) is a driver-side text export "
                f"capped at {_MAX_INLINE_ROWS} rows; pass a path for a "
                "distributed CSV write"
            )
        return pdf.to_csv(index=False, float_format="%g")
    writer = out.coalesce(1) if single_file else out
    writer.write.option("header", True).mode("overwrite").csv(path)
    return None


def write_zrxp(
    df: DataFrame,
    path: str | None = None,
    value_col: str | None = None,
    ts_col: str = "ts",
    rexchange: str | None = None,
    single_file: bool = False,
) -> str | None:
    """stdtozrxp sink (ref stdtozrxp.py:115-123): one ``#REXCHANGE…|*|``
    header when requested, then one ``YYYYMMDDhhmmss, value`` line per
    point. Single-series contract enforced like the reference. With
    ``path=None`` returns the text (driver scale only); with a path,
    writes a distributed text directory (``single_file=True`` coalesces
    for tool interop)."""
    value_cols = [c for c in df.columns if c != ts_col] if value_col is None else [value_col]
    if len(value_cols) != 1:
        raise ValueError(
            f'the "stdtozrxp" sink can only accept a single time-series, '
            f"instead it is seeing {len(value_cols)}"
        )
    line = F.concat(
        F.date_format(ts_col, "yyyyMMddHHmmss"),
        F.lit(", "),
        # %g-style rendering: integral doubles print without the .0,
        # matching python str() for the reference's print formatting
        F.when(
            F.col(value_cols[0]) == F.col(value_cols[0]).cast("long"),
            F.col(value_cols[0]).cast("long").cast("string"),
        ).otherwise(F.col(value_cols[0]).cast("string")),
    ).alias("value")
    out = df.orderBy(ts_col).select(line)
    if path is None:
        rows = out.limit(_MAX_INLINE_ROWS + 1).collect()
        if len(rows) > _MAX_INLINE_ROWS:
            raise ValueError(
                f"write_zrxp(path=None) is a driver-side text export "
                f"capped at {_MAX_INLINE_ROWS} rows; pass a path for a "
                "distributed text write"
            )
        body = "\n".join(r["value"] for r in rows)
        head = f"#REXCHANGE{rexchange}|*|\n" if rexchange else ""
        return head + body + "\n"
    writer = out.coalesce(1) if single_file else out
    writer.write.mode("overwrite").text(path)
    if rexchange:
        import os

        with open(os.path.join(path, "_HEADER.zrxp"), "w") as f:
            f.write(f"#REXCHANGE{rexchange}|*|\n")
    return None


def write_pickle(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """tstopickle sink (ref functions/tstopickle.py:75-118): persist
    the frame as a pickled ts-indexed pandas DataFrame, readable with
    ``pandas.read_pickle``/``pickle.load`` like the reference's output.

    Pickle is a single-file driver-side format by definition, so this
    shares the inline-export guard: above ``_MAX_INLINE_ROWS`` rows it
    refuses — at scale the durable format is parquet
    (``df.write.parquet``), and the reference's own use case (handing a
    small series to another Python process) never exceeds the cap."""
    pdf = df.orderBy(ts_col).limit(_MAX_INLINE_ROWS + 1).toPandas()
    if len(pdf) > _MAX_INLINE_ROWS:
        raise ValueError(
            f"write_pickle is a driver-side single-file export capped "
            f"at {_MAX_INLINE_ROWS} rows; use df.write.parquet for "
            "distributed persistence"
        )
    pdf = pdf.set_index(ts_col)
    pdf.index.name = "Datetime"
    pdf.to_pickle(path)
