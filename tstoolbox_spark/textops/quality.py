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
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1 —
    the public MassiveWeb filter heuristics), as pure column
    expressions: word-count bounds, mean-word-length band, symbol/word
    ratio, alphabetic-word ratio, stopword requirement, plus the
    composite ``keep``. One narrow pass, no shuffle."""
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
    stop_hits = F.size(F.array_distinct(F.filter(w, lambda x: x.isin(*GOPHER_STOPWORDS))))
    flags = {
        "flag_word_count": (n_words >= 50) & (n_words <= 100_000),
        "flag_mean_word_len": (mean_word_len >= 3.0) & (mean_word_len <= 10.0),
        "flag_symbol_ratio": symbol_ratio <= 0.1,
        "flag_alpha_ratio": alpha_ratio >= 0.8,
        "flag_stopwords": stop_hits >= 2,
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
