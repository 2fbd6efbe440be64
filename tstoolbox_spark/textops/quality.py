"""Text analysis: language ID (stopword heuristic), quality scoring,
token counting, document fingerprinting.

All pure column expressions — they run inside whole-stage codegen and
scale as a single narrow pass over the corpus (no shuffle at all for
per-document metrics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5int, normalize_text, shingles, words

#: tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
}


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of stopword hit counts (repeats
    counted); tie → lexicographically first language; no hits → 'und'.
    """
    w = words(F.col(text_col))
    hits = {
        lang: F.size(
            F.filter(w, lambda x: x.isin(*LANG_STOPWORDS[lang]))
        )
        for lang in LANG_STOPWORDS
    }
    best_score = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when((hits[lang] == best_score) & (best_score > 0), F.lit(lang)).otherwise(pred)
    out = df.select(
        F.col(id_col),
        *[hits[lang].alias(f"hits_{lang}") for lang in sorted(LANG_STOPWORDS)],
        pred.alias("lang_pred"),
    )
    return out


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score:
    n_chars, n_words, mean word length, alpha ratio, punct ratio,
    whitespace ratio, stopword(en) ratio, repetition ratio
    (1 - distinct/total words)."""
    t = F.col(text_col)
    w = words(t)
    n_chars = F.length(t)
    n_words = F.size(w)
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", ""))
    space = F.length(F.regexp_replace(t, r"[^\s]", ""))
    sw = LANG_STOPWORDS["en"]
    stop_cnt = F.size(F.filter(w, lambda x: x.isin(*sw)))
    distinct_ratio = F.size(F.array_distinct(w)) / n_words
    mean_wlen = (n_chars - space) / n_words
    score = (
        F.when((n_words >= 10) & (n_words <= 100000), 0.25).otherwise(0.0)
        + F.when((mean_wlen >= 3) & (mean_wlen <= 12), 0.25).otherwise(0.0)
        + F.when(alpha / n_chars >= 0.6, 0.25).otherwise(0.0)
        + F.when(distinct_ratio >= 0.3, 0.25).otherwise(0.0)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(alpha / n_chars, 6).alias("alpha_ratio"),
        F.round(punct / n_chars, 6).alias("punct_ratio"),
        F.round(space / n_chars, 6).alias("space_ratio"),
        F.round(stop_cnt / n_words, 6).alias("stopword_ratio"),
        F.round(1 - distinct_ratio, 6).alias("repetition_ratio"),
        score.alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish regex token
    count (letter runs, digit runs, single punctuation marks — the
    classic GPT-2-style pre-tokenizer shape, simplified)."""
    t = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(t), r"\s+"))
    bpe_ish = F.size(
        F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )
    return df.select(
        F.col(id_col),
        ws_tokens.alias("ws_tokens"),
        bpe_ish.alias("regex_tokens"),
        (F.length(t) / F.lit(4.0)).alias("approx_bytes_per_token_est"),
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Document fingerprint: min/max md5int over word n-gram shingles
    (winnowing-style content fingerprint, order-independent,
    whitespace-robust)."""
    sh = shingles(F.col(text_col), n)
    hashes = F.transform(sh, md5int)
    return df.select(
        F.col(id_col),
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        md5int(normalize_text(F.col(text_col))).alias("content_hash"),
    )


#: the Gopher rules' stopword list (Rae et al. 2021 §A1.1 — public)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_words: int = 50, max_words: int = 100_000,
    min_stopword_hits: int = 2, stopwords: list[str] | None = None,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1 —
    the public MassiveWeb filter heuristics), as pure column
    expressions: word-count bounds, mean-word-length band, symbol/word
    ratio, alphabetic-word ratio, stopword requirement, plus the
    composite ``keep``. One narrow pass, no shuffle. Defaults are the
    paper's; the bounds/stopword knobs exist because real pipelines
    tune them per corpus and language (the paper's English stopword
    rule zeroes a non-English or domain-vocabulary corpus)."""
    t = F.col(text_col)
    w = words(t)
    n_words = F.size(w)
    word_chars = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    mean_word_len = word_chars.cast("double") / n_words
    hash_count = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    ellipsis_count = (
        F.length(t) - F.length(F.regexp_replace(t, r"\.\.\.", ""))
    ) / F.lit(3)
    symbol_ratio = (hash_count + ellipsis_count).cast("double") / n_words
    alpha_words = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    alpha_ratio = alpha_words.cast("double") / n_words
    sw = stopwords if stopwords is not None else GOPHER_STOPWORDS
    stop_hits = F.size(F.array_distinct(F.filter(w, lambda x: x.isin(*sw))))
    flags = {
        "flag_word_count": (n_words >= min_words) & (n_words <= max_words),
        "flag_mean_word_len": (mean_word_len >= 3.0) & (mean_word_len <= 10.0),
        "flag_symbol_ratio": symbol_ratio <= 0.1,
        "flag_alpha_ratio": alpha_ratio >= 0.8,
        "flag_stopwords": stop_hits >= min_stopword_hits,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        stop_hits.alias("stopword_hits"),
        *[expr.alias(name) for name, expr in flags.items()],
        keep.alias("keep"),
    )


def _ngrams_all(w: Column, n: int) -> Column:
    """NON-distinct word n-grams (repetition analysis needs counts —
    contrast shingles(), which dedups for set-similarity). ``w`` is
    let-bound so callers may pass an unevaluated words() expression."""
    from .dedup import let

    return let(
        w,
        lambda arr: F.when(
            F.size(arr) >= n,
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(arr) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(arr, i + 1, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def repetition_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition rules (Rae et al. 2021 §A1.1 — the
    public MassiveWeb repetition filters): duplicate-line fraction,
    duplicate-line character fraction, top-{2,3,4}-gram character
    fraction, duplicate-5-gram character fraction, plus a composite
    ``keep`` using the published thresholds (0.30 / 0.20 / 0.20 /
    0.18 / 0.16 / 0.15).

    Conventions (documented because the paper leaves them open):
    lines are newline-split and trimmed, empty lines dropped; every
    occurrence of a repeated line/gram counts toward the duplicate
    mass (Σ c over groups with c>1); n-grams are over normalized
    words (lowercase, punctuation stripped) with space-joined length
    as char weight; char fractions use non-overlap-aware mass
    (count × gram length), the standard cheap approximation. Top-gram
    ties break on the lexicographically greatest gram so output is
    deterministic.

    Scale shape: one explode + (doc, item-hash) groupBy per unit
    (lines, 2/3/4/5-grams folded into ONE exploded frame tagged by
    n) → per-doc aggregate. Two shuffles total, both keyed by doc —
    linear in corpus size, no self-joins.
    """
    t = F.col(text_col)
    doc = F.col(id_col)
    w = words(t)

    lines = F.filter(
        F.transform(F.split(t, r"\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )
    # one exploded frame: unit = -1 for lines, n for n-grams.
    # NB: the tag lambda must stay unary — a second lambda parameter
    # would make F.transform pass the array INDEX into it.
    def _tag(arr: Column, n: int) -> Column:
        lit_n = F.lit(n)
        return F.transform(arr, lambda x: F.struct(lit_n.alias("n"), x.alias("g")))

    units = df.select(
        doc.alias("doc"),
        F.explode(
            F.flatten(
                F.array(
                    _tag(lines, -1),
                    *[_tag(_ngrams_all(w, n), n) for n in (2, 3, 4, 5)],
                )
            )
        ).alias("u"),
    ).select("doc", F.col("u.n").alias("n"), F.col("u.g").alias("g"))

    grp = units.groupBy("doc", "n", "g").agg(F.count("*").alias("c"))
    glen = F.length("g")
    per = grp.groupBy("doc", "n").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * glen).alias("total_chars"),
        F.sum(F.when(F.col("c") > 1, F.col("c"))).alias("dup"),
        F.sum(F.when(F.col("c") > 1, F.col("c") * glen)).alias("dup_chars"),
        F.max(F.struct(F.col("c"), F.col("g"))).alias("top"),
    )
    frac = lambda num, den: F.round(
        F.coalesce(num, F.lit(0)).cast("double") / den, 6
    )
    pivoted = per.groupBy("doc").pivot("n", [-1, 2, 3, 4, 5]).agg(
        F.first(
            F.struct(
                frac(F.col("dup"), F.col("total")).alias("dup_frac"),
                frac(F.col("dup_chars"), F.col("total_chars")).alias("dup_char_frac"),
                frac(
                    F.col("top.c") * F.length(F.col("top.g")),
                    F.col("total_chars"),
                ).alias("top_char_frac"),
            )
        )
    )
    # empty / whitespace-only docs produce no units at all — keep them
    # in the output with zero metrics (no repetition evidence).
    pivoted = df.select(doc.alias("doc")).distinct().join(
        pivoted, "doc", "left"
    )
    c = lambda n, f: F.coalesce(F.col(f"`{n}`.{f}"), F.lit(0.0))
    metrics = {
        "dup_line_frac": c(-1, "dup_frac"),
        "dup_line_char_frac": c(-1, "dup_char_frac"),
        "top2gram_char_frac": c(2, "top_char_frac"),
        "top3gram_char_frac": c(3, "top_char_frac"),
        "top4gram_char_frac": c(4, "top_char_frac"),
        "dup5gram_char_frac": c(5, "dup_char_frac"),
    }
    limits = {
        "dup_line_frac": 0.30,
        "dup_line_char_frac": 0.20,
        "top2gram_char_frac": 0.20,
        "top3gram_char_frac": 0.18,
        "top4gram_char_frac": 0.16,
        "dup5gram_char_frac": 0.15,
    }
    keep = None
    for name, lim in limits.items():
        ok = metrics[name] <= F.lit(lim)
        keep = ok if keep is None else (keep & ok)
    return pivoted.select(
        F.col("doc").alias(id_col),
        *[expr.alias(name) for name, expr in metrics.items()],
        keep.alias("keep"),
    )


def vocab_topk(
    df: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-level vocabulary head: top-k normalized words by count
    with corpus coverage (count / total tokens). Tie → lexicographic
    order, so output is deterministic. One explode + count shuffle;
    the top-k sort runs on the vocab-sized aggregate, not the corpus.
    """
    ex = df.select(F.explode(words(F.col(text_col))).alias("w"))
    freq = ex.groupBy("w").agg(F.count("*").alias("c"))
    total = ex.count()
    return (
        freq.orderBy(F.col("c").desc(), "w")
        .limit(k)
        .select(
            "w",
            "c",
            F.round(F.col("c").cast("double") / F.lit(float(total)), 6).alias(
                "coverage"
            ),
        )
    )


def _bigram_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, w1, w2) adjacent word pairs; the words array is let-bound
    so each element access is O(1) (see dedup.let)."""
    from .dedup import let

    grams = let(
        words(F.col(text_col)),
        lambda w: F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(w) - 1, F.lit(1))),
                lambda i: F.struct(
                    F.element_at(w, i).alias("w1"),
                    F.element_at(w, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
    )
    return df.select(
        F.col(id_col).alias("doc"), F.explode(grams).alias("g")
    ).select("doc", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: float = 1.0
) -> DataFrame:
    """Corpus-self bigram language-model score per document — the next
    step up from unigram_logprob: p(w2|w1) = (c(w1,w2) + k) /
    (c(w1·) + k·V) with add-k smoothing over the corpus's own counts
    (V = distinct unigram vocabulary; c(w1·) = count of w1 as a bigram
    LEFT context, so probabilities sum to 1 over the vocabulary).
    Score = mean ln p over the doc's bigrams; docs with < 2 words get
    n_bigrams = 0 and a null score.

    Shape: one explode builds the bigram stream, two vocab-sized
    aggregations (bigram counts, left-context counts), one equi-join
    each to score — all map-side combinable, linear in corpus tokens;
    the frequency tables are vocab-scale and AQE decides broadcast.
    """
    ex = _bigram_stream(df, text_col, id_col)
    big = ex.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    left = ex.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = df.select(F.explode(words(F.col(text_col))).alias("w")).agg(
        F.countDistinct("w").alias("v")
    ).collect()[0]["v"]
    scored = (
        ex.join(big, ["w1", "w2"])
        .join(left, "w1")
        .select(
            "doc",
            F.log(
                (F.col("c12") + F.lit(float(k)))
                / (F.col("c1") + F.lit(float(k * vocab)))
            ).alias("lp"),
        )
    )
    agg = scored.groupBy("doc").agg(
        F.round(F.avg("lp"), 6).alias("mean_bigram_logprob"),
        F.count("*").alias("n_bigrams"),
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(agg, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "mean_bigram_logprob",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        )
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-self unigram log-likelihood per document — the classic
    cheap 'perplexity-ish' quality signal: p(w) = corpus count / total
    tokens, score = mean ln p(w) over the doc's tokens (repeats
    counted). Shape: one explode + count shuffle builds the frequency
    table, one hash join scores every token — both scale linearly; the
    frequency table join is plain equi-join (vocab-sized, usually
    broadcastable but left to AQE to decide)."""
    ex = df.select(F.col(id_col).alias("doc"), F.explode(words(F.col(text_col))).alias("w"))
    freq = ex.groupBy("w").agg(F.count("*").alias("c"))
    total = ex.count()
    scored = ex.join(freq, "w").select(
        "doc", F.log(F.col("c").cast("double") / F.lit(float(total))).alias("lp")
    )
    return (
        scored.groupBy("doc")
        .agg(F.round(F.avg("lp"), 6).alias("mean_logprob"), F.count("*").alias("n_words"))
        .select(F.col("doc").alias(id_col), "mean_logprob", "n_words")
    )


def text_normalize(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = False,
    out_col: str | None = None,
) -> DataFrame:
    """Canonicalize text before dedup/fingerprinting: strip ASCII
    control characters, collapse whitespace runs to single spaces,
    trim, optionally lowercase. Pure column expressions (three
    regexp_replace passes + trim), zero shuffle — the standard
    pre-pass that makes exact/MinHash dedup robust to formatting-only
    variants. The regexes use only ASCII classes valid in both Java
    (Spark) and RE2 (DuckDB), so the oracle mirrors them verbatim."""
    out = out_col or f"{text_col}_norm"
    s = F.regexp_replace(F.col(text_col), r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    s = F.regexp_replace(s, r"\s+", " ")
    s = F.trim(s)
    if lowercase:
        s = F.lower(s)
    return df.withColumn(out, s)


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram Shannon entropy in bits — the standard
    token-diversity quality signal (low entropy = boilerplate /
    repeated tokens; the scalar complement to gopher_quality_flags'
    discrete repetition rules).

    Uses the identity H = log2(n) - (Σ c·log2 c)/n so the second
    aggregate needs only (count, c·log2 c) partials. Scale shape:
    explode words → groupBy (doc, token) count → groupBy doc; both
    aggregations are map-side combinable and token strings are gone
    after the first shuffle. The per-token c·log2(c) terms are fixed
    to DECIMAL(38,6) before the cross-row sum (repo determinism rule
    for double sums).

    Output: (id_col, n_tok, entropy_bits), entropy rounded via the
    engine-identical floor(x*1e6+0.5)/1e6.
    """
    toks = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("__w")
    )
    counts = toks.groupBy(id_col, "__w").agg(F.count("*").alias("__c"))
    c = F.col("__c").cast("double")
    agg = counts.groupBy(id_col).agg(
        F.sum("__c").alias("n_tok"),
        F.sum((c * F.log2(c)).cast("decimal(38,6)")).alias("__s"),
    )
    h = F.log2(F.col("n_tok").cast("double")) - F.col("__s").cast("double") / F.col(
        "n_tok"
    )
    return agg.select(
        id_col,
        "n_tok",
        (F.floor(h * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("entropy_bits"),
    )


def kn_bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram score per document (Kneser & Ney
    1995; Chen & Goodman 1998) — the classic "perplexity filter"
    signal (CCNet-style) with principled smoothing, next to the add-k
    :func:`bigram_logprob`:

        P(v|u) = (c(u,v) − d)/c(u·) + d·N1+(u,·)/c(u·) · P_cont(v)
        P_cont(v) = N1+(·,v) / |{distinct bigrams}|

    Score = mean ln P over the doc's bigram instances, each term
    floor-quantized to 1e-6 before the per-doc sum (association-free,
    engine-exact). Docs with < 2 words get n_bigrams = 0, null score.

    Shape: one explode builds the bigram stream; ONE vocab²-scale
    aggregate (bigram counts) carries the whole model — left-context
    totals, follower-type and predecessor-type counts ride two window
    functions over that small frame, and the distinct-bigram total is
    a 1-row broadcast, so scoring is a single equi-join back onto the
    stream (AQE decides broadcast vs shuffle by model size) with no
    extra driver action. Scoring the corpus with its own model means
    every bigram is in-model (no backoff-miss branch); scoring a
    HELD-OUT corpus against this model would add a left join with the
    bare continuation term as the miss branch.
    """
    d = float(discount)
    ex = _bigram_stream(df, text_col, id_col)
    from pyspark.sql import Window

    big = ex.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    model = big.select(
        "w1",
        "w2",
        "c12",
        F.sum("c12").over(Window.partitionBy("w1")).alias("c1"),
        F.count(F.lit(1)).over(Window.partitionBy("w1")).alias("n1f"),
        F.count(F.lit(1)).over(Window.partitionBy("w2")).alias("n1b"),
    )
    d_tot = big.agg(F.count(F.lit(1)).cast("double").alias("__dt"))
    p = (
        (F.col("c12") - F.lit(d)) / F.col("c1")
        + (F.lit(d) * F.col("n1f") / F.col("c1"))
        * (F.col("n1b") / F.col("__dt"))
    )
    scored = (
        ex.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(d_tot))
        .select("doc", F.floor(F.log(p) * F.lit(1e6) + F.lit(0.5)).alias("lp_q6"))
    )
    agg = scored.groupBy("doc").agg(
        F.round(
            F.sum("lp_q6").cast("double") / F.count("*") / F.lit(1e6), 6
        ).alias("mean_kn_logprob"),
        F.count("*").alias("n_bigrams"),
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(agg, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "mean_kn_logprob",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        )
    )


def zipf_alpha(
    df: DataFrame,
    text_col: str = "text",
    key_cols: Sequence[str] = (),
    top_k: int = 1000,
) -> DataFrame:
    """Zipf exponent of the corpus word-frequency curve per key:
    OLS slope of ln(freq) ~ ln(rank) over the top_k vocabulary head,
    reported as alpha = −slope (natural text sits near 1.0 — a cheap
    distribution-shift / synthetic-text diagnostic for LM data).

    Shapes: word counts are one explode + map-combinable groupBy; the
    rank window sorts the AGGREGATED vocabulary of each key (vocab
    scale, not corpus scale — the hist_topk shape), and the head is
    capped at top_k rows per key before the regression. Every
    log-term is quantized to 1e-9 and summed as BIGINT, so the OLS
    moments are association-free and engine-exact.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    cnts = (
        df.select(*keys, F.explode(words(F.col(text_col))).alias("w"))
        .groupBy(*keys, "w")
        .agg(F.count("*").alias("cnt"))
    )
    rk = Window.partitionBy(*keys).orderBy(
        F.col("cnt").desc(), F.col("w").asc()
    )
    ranked = cnts.withColumn("rank", F.row_number().over(rk)).filter(
        F.col("rank") <= top_k
    )
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("cnt").cast("double"))
    q = lambda c: F.floor(c * 1e9 + 0.5).cast("long")  # noqa: E731
    g = ranked.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(q(x)).alias("__sx"),
        F.sum(q(y)).alias("__sy"),
        F.sum(q(x * y)).alias("__sxy"),
        F.sum(q(x * x)).alias("__sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double") / 1e9
    sy = F.col("__sy").cast("double") / 1e9
    sxy = F.col("__sxy").cast("double") / 1e9
    sxx = F.col("__sxx").cast("double") / 1e9
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return g.select(
        *keys, F.round(-slope, 6).alias("zipf_alpha"),
        F.col("n").cast("long").alias("n_ranks"),
    )
