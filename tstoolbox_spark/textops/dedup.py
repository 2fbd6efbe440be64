"""Deduplication operators.

Scale design notes (100 TB corpus):
- exact: one hash-groupBy on the normalized text digest — map-side
  combine, no payload shuffle (only digests move).
- n-gram Jaccard: candidate pairs via equi-join on shared shingles
  (inverted-index join), never an all-pairs product; hot shingles
  (stopword bigrams) are capped by document frequency before the join
  (standard posting-list pruning).
- MinHash-LSH: k=16 universal-hash signature over pre-hashed
  shingles; band shape defaults to the threshold-matched factorization
  of k (auto_band_shape). Signatures + bands are pure column
  expressions; the band join moves (band_hash, doc_id) pairs only.
- SimHash: 16-bit majority signature via one explode + one groupBy.

Portable hashing: ``md5int`` = first 15 hex chars of md5 as int64 —
identical in Spark and ANSI/DuckDB SQL, so every signature here is
oracle-checkable (xxhash64 would be Spark-only). Shingles are hashed
per WORD once and combined with integer arithmetic (hashed_shingles),
so the hot dedup paths never build or hash per-shingle strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = 4
SIMHASH_BITS = 16


def md5int(col: Column) -> Column:
    """Portable 60-bit hash: int(md5(x)[:15], 16)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def normalize_text(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace."""
    out = F.lower(col)
    out = F.regexp_replace(out, r"[^a-z0-9\s]", "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def words(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


#: Mersenne prime for word hashing + the universal MinHash family
MH_PRIME = 2147483647
#: shingle-combine multiplier (small prime: n=2 combines stay < 2^52)
SHINGLE_K = 1000003


def let(bound: Column, fn) -> Column:
    """Bind ``bound`` to a lambda variable so ``fn`` can reference it
    many times at O(1) cost.

    Higher-order functions evaluate their lambdas in interpreted mode
    with NO common-subexpression elimination: ``element_at(expr, i)``
    inside a ``transform`` re-evaluates the whole ``expr`` per element
    (O(n²) when expr itself is O(n) — measured 30× on the bigram
    stream).  Lambda *variables*, by contrast, are evaluated once and
    bound, so wrapping the expression as the single element of an
    array and transforming over it gives let-binding semantics with
    pure Catalyst expressions."""
    return F.element_at(F.transform(F.array(bound), fn), 1)


def shingles(col: Column, n: int = 2) -> Column:
    """Distinct word n-grams as an array of strings (built-in
    transform/slice — no UDF; words bound once via :func:`let`)."""
    if n == 1:
        return F.array_distinct(words(col))
    grams = let(
        words(col),
        lambda w: F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
            ),
        ).otherwise(F.array()),
    )
    return F.array_distinct(grams)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups on normalized text: one row per distinct
    content with the keeper id (min id) and the duplicate count."""
    return (
        df.select(md5int(normalize_text(F.col(text_col))).alias("content_hash"), id_col)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("dup_count"))
    )


def hashed_shingles(col: Column, n: int = 2) -> Column:
    """Distinct word n-grams as int64 hashes: each word hashed ONCE
    (md5int mod 2³¹−1), adjacent hashes combined as h₁·K + h₂ — no
    per-shingle string building, no md5 of concatenated grams, and the
    downstream inverted-index joins key on longs instead of strings.
    Combined values stay < 2⁵² (exact in int64 AND in the DuckDB
    oracle); collision odds for millions of shingles in 2⁵² space are
    negligible next to the jaccard thresholds involved. n ≤ 2 only —
    larger n would overflow the no-mod combine; use ``shingles``.
    """
    if n > 2:
        raise ValueError("hashed_shingles supports n <= 2; use shingles(col, n)")
    wh = F.transform(words(col), lambda x: md5int(x) % F.lit(MH_PRIME))
    if n == 1:
        return F.array_distinct(wh)
    grams = let(
        wh,
        lambda h: F.when(
            F.size(h) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(h) - 1, F.lit(1))),
                lambda i: F.element_at(h, i) * F.lit(SHINGLE_K)
                + F.element_at(h, i + 1),
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )
    return F.array_distinct(grams)


def _exploded_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    if n > 2:
        return df.select(
            F.col(id_col).alias("doc"),
            F.explode(shingles(F.col(text_col), n)).alias("shingle"),
        )
    # Two projection steps so the per-word hash array materializes ONCE
    # per row: inlining it into the gram lambda would re-evaluate every
    # word's md5 per element access (O(words²) hashing).
    wh = F.transform(
        words(F.col(text_col)), lambda x: md5int(x) % F.lit(MH_PRIME)
    )
    base = df.select(F.col(id_col).alias("doc"), wh.alias("__wh"))
    arr = F.col("__wh")
    if n == 1:
        sh = F.array_distinct(arr)
    else:
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(arr) - 1, F.lit(1))),
            lambda i: F.element_at(arr, i) * F.lit(SHINGLE_K)
            + F.element_at(arr, i + 1),
        )
        sh = F.when(F.size(arr) >= 2, F.array_distinct(grams)).otherwise(
            F.array().cast("array<bigint>")
        )
    return base.select("doc", F.explode(sh).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.5,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs with Jaccard(shingle sets) ≥ threshold.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle, count shared per pair, |A∪B| = |A|+|B|-shared. The
    posting-list self-join is quadratic in a shingle's document
    frequency, so stopword-like shingles with df > ``max_doc_freq``
    are dropped from the index BY DEFAULT (default-on pruning: a hot
    shingle at df=10⁶ would alone emit 10¹² candidate pairs; capping
    df bounds each shingle's contribution at max_doc_freq² while
    near-dup pairs keep sharing plenty of rare shingles). Pass
    ``max_doc_freq=None`` for the exact unpruned semantics — oracle
    scale only.
    """
    ex = _exploded_shingles(df, text_col, id_col, n)
    if max_doc_freq is not None:
        freq = ex.groupBy("shingle").agg(F.count("*").alias("df_"))
        ex = ex.join(F.broadcast(freq.filter(F.col("df_") <= max_doc_freq)), "shingle")
        ex = ex.select("doc", "shingle")
    sizes = ex.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    a = ex.alias("a")
    b = ex.alias("b")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    out = (
        shared.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def mh_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for hash_i(x) = (a·x + b) mod p —
    md5-seeded so every run/cluster/engine derives the same family."""
    import hashlib

    out = []
    for i in range(k):
        a = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:15], 16) % (MH_PRIME - 1) + 1
        b = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:15], 16) % MH_PRIME
        out.append((a, b))
    return out


def minhash_signature(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = MINHASH_K, n: int = 2,
) -> DataFrame:
    """k-permutation MinHash signature columns mh0..mh{k-1}.

    Shingles arrive pre-hashed (hashed_shingles: one md5 per WORD),
    h0 = shingle mod p, and the k permutations are the universal
    family hash_i = (a_i·h0 + b_i) mod p — integer mul-add-mods
    instead of k md5-of-concat evaluations per exploded shingle row
    (the signature stage's hot loop; p = 2³¹−1 keeps every product
    inside int64 and the formula portable to the SQL oracle).
    """
    ex = _exploded_shingles(df, text_col, id_col, n)
    h0 = (F.col("shingle") % F.lit(MH_PRIME)).alias("h0")
    ex = ex.select("doc", h0)
    aggs = [
        F.min((F.lit(a) * F.col("h0") + F.lit(b)) % F.lit(MH_PRIME)).alias(f"mh{i}")
        for i, (a, b) in enumerate(mh_params(k))
    ]
    return ex.groupBy(F.col("doc").alias(id_col)).agg(*aggs)


def band_explode(
    signatures: DataFrame, id_col: str = "doc_id",
    bands: int = LSH_BANDS, rows: int = LSH_ROWS,
) -> DataFrame:
    """Long-form LSH band table ``(doc, band, bh)`` from a minhash
    signature frame — the unit of LSH state: a doc's band hashes are
    all an incremental dedup run ever needs to re-candidate it against
    future batches (pipeline/incremental_dedup.py)."""
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws(",", *parts)).alias("bh"))
        )
    return signatures.select(
        F.col(id_col).alias("doc"), F.explode(F.array(*band_cols)).alias("bandrec")
    ).select("doc", F.col("bandrec.band").alias("band"), F.col("bandrec.bh").alias("bh"))


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id",
    bands: int = LSH_BANDS, rows: int = LSH_ROWS,
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of ≥1 band become a
    candidate pair. Output distinct (doc_a < doc_b)."""
    exploded = band_explode(signatures, id_col, bands, rows)
    a, b_ = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b_, ["band", "bh"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def auto_band_shape(k: int, threshold: float) -> tuple[int, int]:
    """Pick the (bands, rows) factorization of k whose LSH s-curve
    midpoint (1/b)^(1/r) sits closest BELOW-or-near the target jaccard
    threshold — low thresholds need many short bands (recall), high
    thresholds few long bands (precision); the exact-jaccard verify
    step removes the false positives either way."""
    best = None
    for r in range(1, k + 1):
        if k % r:
            continue
        b = k // r
        # (1/b)^(1/r) is the s-curve midpoint for every b, including
        # b == 1 where it evaluates to 1.0 (a single band of r rows
        # requires ALL r minhashes to agree — only right near the top
        # of the threshold range).
        mid = (1.0 / b) ** (1.0 / r)
        score = (abs(mid - threshold), mid > threshold)
        if best is None or score < best[0]:
            best = (score, (b, r))
    return best[1]


def minhash_lsh_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n: int = 2, threshold: float = 0.5, k: int = MINHASH_K,
    bands: int | None = None, rows: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified.

    shingle → minhash → band → bucket-join → verify: candidates come
    from LSH (sub-quadratic), and each candidate's true Jaccard is
    computed via the shingle join RESTRICTED to candidate pairs (a
    semi-join keeps the verify stage linear in candidates).
    ``bands``/``rows`` default to the threshold-matched factorization
    of k (auto_band_shape) so recall tracks the asked-for jaccard
    instead of a fixed band geometry.
    """
    if bands is None or rows is None:
        bands, rows = auto_band_shape(k, threshold)
    sig = minhash_signature(df, text_col, id_col, k, n)
    cand = lsh_candidate_pairs(sig, id_col, bands, rows).persist()
    return verify_candidates(df, cand, text_col, id_col, n, threshold)


def verify_candidates(
    df: DataFrame, cand: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n: int = 2, threshold: float = 0.5,
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs ``(doc_a,
    doc_b)`` against the docs in ``df`` — the verify half of
    :func:`minhash_lsh_dedup`, exposed so incremental runs can verify
    new×old candidates against the committed corpus."""
    # verify only candidate DOCS' shingles: the posting-list self-join
    # over the full corpus squares on hot shingles (a stopword bigram
    # touches every doc); restricting to candidate members BEFORE the
    # shingle explode keeps the verify stage linear in |candidates| —
    # 15x on the sf0.1 corpus, the difference between feasible and not
    # at 100 TB — and never re-shingles non-candidate text (the
    # property the incremental fold depends on).
    cand_docs = (
        cand.select(F.col("doc_a").alias(id_col))
        .unionByName(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    # BOUND: broadcasting cand_docs assumes |candidate doc ids| fits the
    # broadcast limit (~10^8 ids at 8 B ≈ 1 GB). That holds when the
    # near-dup rate is a few % of the corpus — the regime LSH targets.
    # If a corpus is mostly duplicates, drop the broadcast hint and let
    # AQE choose a shuffle semi-join instead.
    df_c = df.join(F.broadcast(cand_docs), id_col, "left_semi")
    ex_c = _exploded_shingles(df_c, text_col, id_col, n)
    sizes = ex_c.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    a, b_ = ex_c.alias("a"), ex_c.alias("b")
    shared = (
        a.join(b_, "shingle")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
        .join(cand, ["doc_a", "doc_b"], "left_semi")
    )
    return (
        shared.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash signature: bit k set iff the count-weighted majority of
    word hashes has bit k set. One explode + one groupBy."""
    w = df.select(F.col(id_col).alias("doc"), F.explode(words(F.col(text_col))).alias("w"))
    counts = w.groupBy("doc", "w").agg(F.count("*").alias("cnt"))
    h = md5int(F.col("w"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, k).bitwiseAND(F.lit(1)) == 1, F.col("cnt")).otherwise(
                -F.col("cnt")
            )
        ).alias(f"s{k}")
        for k in range(bits)
    ]
    agg = counts.groupBy("doc").agg(*bit_sums)
    sig = None
    for k in range(bits):
        term = F.when(F.col(f"s{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select(F.col("doc").alias(id_col), sig.cast("long").alias("simhash"))


def simhash_pairs(
    sig: DataFrame, id_col: str = "doc_id", max_hamming: int = 2,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Banded join (pigeonhole): split the signature into
    (max_hamming + 1) chunks — near-dups must agree exactly on ≥1
    chunk, so candidates come from equality joins, not a cross join.
    """
    chunks = max_hamming + 1
    width = bits // chunks
    cand = None
    for c in range(chunks):
        part = F.shiftright(F.col("simhash"), c * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        side = sig.select(F.col(id_col).alias("doc"), F.col("simhash"), part.alias("chunk"))
        a, b = side.alias("a"), side.alias("b")
        pairs = (
            a.join(b, "chunk")
            .filter(F.col("a.doc") < F.col("b.doc"))
            .select(
                F.col("a.doc").alias("doc_a"),
                F.col("b.doc").alias("doc_b"),
                F.col("a.simhash").alias("ha"),
                F.col("b.simhash").alias("hb"),
            )
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.distinct()
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def hashmin_propagate(
    labels: DataFrame, pairs: DataFrame, max_iter: int = 15,
) -> DataFrame:
    """Min-label propagation (HashMin) over an undirected pair graph:
    ``labels`` is ``(doc, label)`` seed rows (a fresh run seeds
    label = doc; an incremental run seeds old docs with their
    committed cluster id so only the touched subgraph iterates);
    ``pairs`` is ``(doc_a, doc_b)``. Converges in O(graph diameter)
    rounds; each round is one join + one groupBy on the label frame,
    never on payloads, with ``localCheckpoint`` truncating the
    iterative lineage. Returns the converged ``(doc, label)``."""
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc == neighbor_min.src, "left")
            .select(
                F.col("doc"),
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
                (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label")).alias(
                    "__chg"
                ),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("__chg")).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def near_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pairs: DataFrame | None = None,
    n: int = 2,
    threshold: float = 0.5,
    max_iter: int = 15,
) -> DataFrame:
    """Connected components over the near-dup pair graph: assign every
    doc a cluster id (the lexicographic min doc in its component) and a
    ``keeper`` flag — the "keep one per near-dup cluster" primitive a
    training-data pipeline actually applies.

    Algorithm: min-label propagation (HashMin). label(v) starts as v;
    each round v takes min(label(v), min over neighbors' labels);
    converges in O(graph diameter) rounds — near-dup components are
    tiny cliques/chains, so a handful. Each round is one join + one
    groupBy on the (small) label frame, never on payloads; the driver
    only counts changes. ``localCheckpoint`` every round truncates the
    iterative lineage so plans stay flat.
    """
    if pairs is None:
        pairs = minhash_lsh_dedup(df, text_col, id_col, n=n, threshold=threshold)
    labels = (
        df.select(F.col(id_col).alias("doc")).distinct().withColumn("label", F.col("doc"))
    )
    labels = hashmin_propagate(labels, pairs, max_iter)
    return labels.select(
        F.col("doc").alias(id_col),
        F.col("label").alias("cluster"),
        (F.col("doc") == F.col("label")).alias("keeper"),
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    n: int = 2,
) -> DataFrame:
    """Cross-source contamination matrix: Jaccard similarity of the
    DISTINCT shingle sets of every source pair — the corpus-level
    diagnostic for "which feeds overlap" (run before mixing sources or
    to locate likely train/eval leakage at the source granularity).

    Scale shape: NO self-join of the shingle stream.  The stream
    reduces to distinct (source, shingle) rows, then one groupBy
    per shingle collects its source set (≤ n_sources entries) and
    emits in-shingle pairs — work per shingle is bounded by
    n_sources², a constant, while the heavy dimension (shingles)
    stays a single map-side-combinable aggregation.  Intersections
    and per-source distinct counts combine as
    |A∪B| = |A|+|B|−|A∩B|.

    Output: (source_a, source_b, inter, n_a, n_b, jaccard) for every
    pair with inter > 0, source_a < source_b.
    """
    ss = _exploded_shingles(
        df.select(F.col(source_col).alias("doc_id"), text_col), text_col, "doc_id", n
    ).select(F.col("doc").alias("src"), "shingle").distinct()
    per_source = ss.groupBy("src").agg(F.count(F.lit(1)).alias("n_src"))
    pairs_per_shingle = ss.groupBy("shingle").agg(
        F.array_sort(F.collect_set("src")).alias("srcs")
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("srcs"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("srcs"), i + 2,
                        F.greatest(F.size(F.col("srcs")) - i - 1, F.lit(0)),
                    ),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    inter = (
        pairs_per_shingle.select(pair.alias("p"))
        .select(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = per_source.select(F.col("src").alias("source_a"), F.col("n_src").alias("n_a"))
    cb = per_source.select(F.col("src").alias("source_b"), F.col("n_src").alias("n_b"))
    out = inter.join(F.broadcast(ca), "source_a").join(F.broadcast(cb), "source_b")
    return out.select(
        "source_a",
        "source_b",
        "inter",
        "n_a",
        "n_b",
        F.round(
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")),
            6,
        ).alias("jaccard"),
    )


def canonical_pick(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Choose the canonical representative of every near-dup cluster:
    highest score wins, ties break to the lexicographically smallest
    id — the selection step a dedup pipeline applies after
    :func:`near_dup_clusters` (keep the best copy, not an arbitrary
    one; score is pluggable — length, quality_score, recency).

    One inner join on ids and one argmax aggregate via
    ``min(struct(-score, id))`` — no window over the full corpus, and
    partial aggregation applies (struct-min is associative). Scores
    compare as doubles (exact for the integral scores used here).
    """
    joined = clusters.join(scores.select(id_col, score_col), id_col)
    best = joined.groupBy("cluster").agg(
        F.min(
            F.struct(
                (-F.col(score_col).cast("double")).alias("ns"),
                F.col(id_col).alias("doc"),
            )
        ).alias("b"),
        F.count("*").alias("n_docs"),
    )
    return best.select(
        "cluster",
        F.col("b.doc").alias(id_col),
        (-F.col("b.ns")).alias(score_col),
        F.col("n_docs").cast("long").alias("n_docs"),
    )
