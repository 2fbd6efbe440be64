"""Vectorized time-series compression: Gorilla-style XOR value codec +
delta-of-delta timestamp codec, block-oriented for numpy-vectorizable
encode AND decode (no per-row Python — the north rule's constraint).

Algorithm lineage: Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015 (public paper). The
canonical format is per-value variable-length and therefore inherently
sequential to decode; this implementation lifts the same two ideas
(XOR-with-previous for values, delta-of-delta for timestamps) to
fixed-size blocks whose bit-width is chosen per block — the
frame-of-reference trick used by columnar engines — so both directions
are pure numpy array ops. Compression on regular grids is equivalent
(dod == 0 → ~0 bits/point); the divergence from the canonical stream
layout is deliberate and documented here.
"""

from .gorilla import decode_bucket, encode_bucket  # noqa: F401
