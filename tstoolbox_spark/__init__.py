"""tstoolbox_spark — a from-scratch PySpark-native time-series rollup,
downsample and retention engine with the query semantics of
the-real-werd/tstoolbox (reference at /root/reference, studied for
behavior only; all implementations here are original Spark-first code).

Layout
------
- ``session``    SparkSession factory tuned for local[N] testing and
                 cluster submission.
- ``datagen``    deterministic generator for the engine-native input
                 table ``(doc_id, tokens, n_tok, source)``.
- ``timeaxis``   deterministic ts derivation from doc_id.
- ``operators``  the tstoolbox verb library re-expressed as DataFrame ops.
- ``codec``      vectorized Gorilla-style XOR + delta-of-delta block codec.
- ``pipeline``   salted bucketing, tiered rollup cascade, retention,
                 lineage/resume.
- ``textops``    large-scale training-data ops: dedup, similarity,
                 text quality, fingerprints.
"""

__version__ = "0.1.0"
