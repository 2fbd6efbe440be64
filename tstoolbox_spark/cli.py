"""Reference-parity CLI: ``python -m tstoolbox_spark <verb> [--flag=value ...]``.

The reference is driven as ``tstoolbox <verb> --opts < in.csv > out.csv``
(ref tstoolbox/tstoolbox.py:63-67, mando dispatch): a user switching
engines keeps the same shell shape here. Dispatch is a registry of
verb → library operator; the COMMON pipeline flags run first in the
reference's fixed order (tsutils.py:1164-1224 → operators/core.
apply_common): ``--columns → --clean → --round_index → --force_freq →
--start_date/--end_date → --dropna``; remaining ``--key=value`` flags
pass through to the operator with literal coercion ('1'→int,
'a,b'→list, 'True'→bool).

Input: ``--input_ts`` (CSV path, '-'/absent = stdin, a .parquet path
reads parquet directly). Output: printiso CSV on stdout (driver-scale
collect — this is the INTERACTIVE surface; pipelines at scale call the
library and write parquet/snapshots instead).
"""

from __future__ import annotations

import ast
import sys

from pyspark.sql import DataFrame, SparkSession


def _verb_registry() -> dict[str, callable]:
    from .operators import accumulate as _acc
    from .operators import aggregate as _agg
    from .operators import backtest as _backtest
    from .operators import drift as _drift
    from .operators import states as _states
    from .operators import core, counters, downsample, fill, peaks, reshape
    from .operators import scan, signal, stats, transform, window

    return {
        "aggregate": _agg.aggregate,
        "describe": _agg.describe,
        "accumulate": _acc.accumulate,
        "rolling_window": window.rolling_window,
        "expanding_window": window.expanding_window,
        "ewm_window": window.ewm_window,
        "lag": window.lag,
        "pct_change": window.pct_change,
        "rank": window.rank,
        "fill": fill.fill,
        "clip": transform.clip,
        "replace": transform.replace,
        "convert": transform.convert,
        "normalization": transform.normalization,
        "converttz": transform.converttz,
        "date_offset": transform.date_offset,
        "convert_index": transform.convert_index_to_number,
        "convert_index_to_datetime": transform.convert_index_to_datetime,
        # ref flag is --equation; the operator parameter is expr
        "equation": lambda df, equation=None, expr=None, **kw: (
            _equation_op(df, expr if expr is not None else equation, **kw)
        ),
        "stack": reshape.stack,
        "unstack": reshape.unstack,
        "createts": reshape.createts,
        "peak_detection": peaks.peak_detection,
        "gof": stats.gof,
        "correlation": stats.autocorrelation,
        "fit": stats.linear_fit,
        "remove_trend": lambda df, **kw: stats.linear_fit(df, remove=True, **kw),
        "add_trend": stats.add_trend,
        "calculate_fdc": stats.fdc,
        "calculate_kde": signal.gaussian_kde,
        "dtw": signal.dtw_distance,
        "filter": _dispatch_filter,
        "theil_sen": stats.theil_sen,
        "dominant_period": stats.dominant_period,
        "upsample": core.upsample_linear,
        "counter_agg": counters.counter_agg,
        "detect_gaps": counters.detect_gaps,
        "time_weighted_avg": _agg.time_weighted_avg,
        "m4": downsample.m4_downsample,
        "cross_correlation": lambda df, lags="1", **kw: stats.cross_correlation(
            df, lags=[int(x) for x in str(lags).split(",")], **kw
        ),
        "holt": scan.holt,
        "holt_winters": scan.holt_winters,
        "holt_forecast": scan.holt_forecast,
        "holt_winters_forecast": scan.holt_winters_forecast,
        "ljung_box": stats.ljung_box,
        "ar2": stats.ar2_yule_walker,
        "pacf": stats.pacf,
        "integrate": _acc.integrate,
        "sax": signal.sax_daily,
        "state_agg": _states.state_durations,
        "state_runs": _states.state_runs,
        "backtest_folds": _backtest.rolling_origin_folds,
        "drawdown": window.drawdown,
        "weighted_mean": _agg.weighted_mean,
        "quantile_normalize": transform.quantile_normalize,
        "staleness": counters.staleness_report,
        "null_profile": core.null_profile,
        "benford": _drift.benford_digits,
        "pearson_matrix": _stats_pearson,
        # portable-HLL distinct estimate per tier bucket: partial →
        # cascade happens upstream in the pipeline; the verb runs the
        # one-shot partial+estimate on a raw frame.
        "approx_distinct": _phll_verb,
        # sink verb (ref functions/tstopickle.py): common pipeline
        # runs first, then the frame is pickled; stdout stays empty
        # (header-only) like the reference.
        "tstopickle": _dispatch_tstopickle,
        # common-pipeline-only verbs: the shared flags do all the work
        "pick": lambda df: df,
        "date_slice": lambda df: df,
        "clean": lambda df: df,
        "round_index": lambda df: df,
        "dropna": lambda df: df,
        "asbestfreq": lambda df: df,
    }


def _stats_pearson(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str = "ts",
    check_unique: bool = False,
):
    # explicit parameters, no **kw: run_verb treats a var-keyword
    # wrapper as accepting every shared flag and would inject
    # key_cols, which pearson_matrix (key_col, singular) rejects
    from .operators.stats import pearson_matrix

    return pearson_matrix(
        df, key_col, value_col, ts_col=ts_col, check_unique=check_unique
    )


def _phll_verb(
    df: DataFrame,
    value_col: str,
    tier: str = "1d",
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
):
    # explicit parameters (the _stats_pearson convention): run_verb
    # injects only flags the wrapper names
    from .pipeline.hll import phll_estimate, phll_partial

    keys = tuple(key_cols or ())
    reg = phll_partial(
        df, tier, key_cols=keys, value_col=value_col, ts_col=ts_col
    )
    return phll_estimate(reg, key_cols=keys)


def _dispatch_tstopickle(df: DataFrame, filename: str, ts_col: str = "ts"):
    from .sources import write_pickle

    write_pickle(df, str(filename), ts_col=ts_col)
    return df.limit(0)


def _equation_op(df: DataFrame, expr: str, **kw):
    from .operators.equation import equation as _eq

    return _eq(df, expr, **kw)


def _dispatch_filter(df: DataFrame, filter_type: str = "flat", **kw):
    """Route the reference's ``filter --filter_type=X`` to the matching
    engine operator (kernel windows / fft / butterworth)."""
    from .operators import signal

    if filter_type in ("flat", "hanning", "hamming", "bartlett", "blackman"):
        return signal.kernel_filter(df, kernel=filter_type, **kw)
    if filter_type in ("fft", "fft_lowpass", "fft_highpass"):
        return signal.fft_filter(df, **kw)
    if filter_type == "butterworth":
        return signal.butterworth_filter(df, **kw)
    raise ValueError(f"unknown filter_type {filter_type!r}")


#: flags consumed by the common pipeline, reference names → apply_common
_COMMON = {
    "columns": "columns",
    "clean": "do_clean",
    "round_index": "round_freq",
    "force_freq": "freq",
    "start_date": "start",
    "end_date": "end",
    "dropna": "drop",
}
#: flags consumed by the CLI itself
_CLI_FLAGS = {"input_ts", "sep", "skiprows", "index_type", "key_cols"}


def _coerce(text: str):
    """'1'→1, '1.5'→1.5, 'True'→True, 'a,b'→['a','b'], else str."""
    if "," in text:
        return [_coerce(p) for p in text.split(",") if p != ""]
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


def parse_argv(argv: list[str]) -> tuple[str, dict]:
    if not argv or argv[0] in ("-h", "--help"):
        verbs = ", ".join(sorted(_verb_registry()))
        sys.stderr.write(
            "usage: python -m tstoolbox_spark <verb> [--flag=value ...]\n"
            f"verbs: {verbs}\n"
        )
        raise SystemExit(0 if argv else 2)
    verb, flags = argv[0], {}
    args = argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if not a.startswith("--"):
            raise SystemExit(f"unexpected positional argument {a!r}")
        body = a[2:]
        if "=" in body:
            k, v = body.split("=", 1)
        elif i + 1 < len(args) and not args[i + 1].startswith("--"):
            k, v = body, args[i + 1]
            i += 1
        else:
            k, v = body, "True"  # bare flag (e.g. --clean)
        flags[k] = v
        i += 1
    return verb, flags


def run_verb(
    spark: SparkSession, verb: str, flags: dict[str, str]
) -> DataFrame:
    """Resolve input → common pipeline → operator; returns the result
    frame (the CLI prints it, tests inspect it)."""
    from .operators.core import apply_common
    from .sources.csv import read_timeseries_csv

    registry = _verb_registry()
    if verb not in registry:
        raise SystemExit(
            f"unknown verb {verb!r}; run with --help for the list"
        )
    src = flags.get("input_ts", "-")
    if src.endswith(".parquet"):
        df = spark.read.parquet(src)
    elif src == "-":
        import tempfile

        text = sys.stdin.read()
        with tempfile.NamedTemporaryFile(
            "w", suffix=".csv", delete=False
        ) as f:
            f.write(text)
        df = read_timeseries_csv(
            spark,
            f.name,
            sep=flags.get("sep"),
            skiprows=int(flags.get("skiprows", 0)),
            index_type=flags.get("index_type", "datetime"),
        )
    else:
        df = read_timeseries_csv(
            spark,
            src,
            sep=flags.get("sep"),
            skiprows=int(flags.get("skiprows", 0)),
            index_type=flags.get("index_type", "datetime"),
        )

    common_kw = {}
    for ref_name, kw_name in _COMMON.items():
        if ref_name in flags:
            v = _coerce(flags[ref_name])
            if ref_name == "columns" and not isinstance(v, list):
                v = [v]
            common_kw[kw_name] = v
    key_cols = ()
    if "key_cols" in flags:
        kc = _coerce(flags["key_cols"])
        key_cols = tuple(kc) if isinstance(kc, list) else (kc,)
        common_kw["key_cols"] = key_cols
    df = apply_common(df, **common_kw)

    fn = registry[verb]
    op_kw = {
        k: _coerce(v)
        for k, v in flags.items()
        if k not in _COMMON and k not in _CLI_FLAGS
    }
    import inspect

    sig = inspect.signature(fn)
    accepts_keys = "key_cols" in sig.parameters or any(
        p.kind == p.VAR_KEYWORD for p in sig.parameters.values()
    )
    if key_cols and accepts_keys:
        op_kw.setdefault("key_cols", key_cols)
    return fn(df, **op_kw)


def main(argv: list[str] | None = None) -> None:
    from .session import get_spark
    from .sources.csv import write_iso_csv

    verb, flags = parse_argv(list(sys.argv[1:] if argv is None else argv))
    spark = get_spark("tstoolbox-cli", parallelism=8)
    out = run_verb(spark, verb, flags)
    sys.stdout.write(write_iso_csv(out) or "")


if __name__ == "__main__":  # pragma: no cover
    main()
