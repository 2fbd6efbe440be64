"""tstoolbox verb library re-expressed as Spark DataFrame operators.

Every operator is a pure function ``DataFrame -> DataFrame`` over the
engine's long-form layout: an explicit timestamp column (``ts``),
zero-or-more series-key columns (``key_cols`` — a series per distinct
key tuple), and one-or-more numeric value columns. Wide pandas frames
exist only inside per-group pandas UDFs.

Semantics follow the reference verbs (cited per function); the
implementations are original DataFrame/window compositions designed
for partitioned execution — no driver-side collects, no per-row
Python.
"""

from . import accumulate, aggregate, core, equation, fill, peaks, reshape, signal, stats, transform, window  # noqa: F401
