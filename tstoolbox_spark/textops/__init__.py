"""Large-scale training-data operators over document/embedding tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + IVF), text
analysis (language-ID, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing.

All hot paths are built-in Spark SQL expressions (JVM, whole-stage
codegen); hashing uses a portable md5-derived 60-bit integer so every
signature is reproducible in ANSI SQL for the DuckDB oracle.
"""

from . import (  # noqa: F401
    contamination,
    dedup,
    packing,
    pii,
    quality,
    sampling,
    similarity,
    substring,
)
