"""PII detection and redaction — standard training-pipeline hygiene
stage (the public C4/Dolma/BigScience-style regex scrubbers).

Pure column expressions: zero shuffle, one narrow pass, pushdown- and
codegen-friendly. The regexes deliberately stay inside the syntax
intersection of Java regex (Spark) and RE2 (DuckDB oracle): character
classes, bounded repetition, \\b anchors — no backreferences or
lookaround, which RE2 lacks and which a 100 TB scan shouldn't pay for
anyway (RE2-safe patterns keep the scan linear in input bytes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: conservative, dialect-portable patterns
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
#: international-ish phone: leading digit/+, then >= 7 phone chars,
#: ending in a digit (keeps short numbers and years out)
PHONE_RE = r"\+?[0-9][0-9() \-]{6,}[0-9]"

_PATTERNS = [("email", EMAIL_RE), ("ipv4", IPV4_RE), ("phone", PHONE_RE)]


def _count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def pii_flags(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per document: match counts for each PII class plus the
    composite ``has_pii``. One projection, no shuffle."""
    t = F.col(text_col)
    counts = {name: _count_matches(t, pat) for name, pat in _PATTERNS}
    has = None
    for c in counts.values():
        has = (c > 0) if has is None else (has | (c > 0))
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        has.alias("has_pii"),
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Replace every PII match with a typed sentinel (<EMAIL>, <IPV4>,
    <PHONE>). Email runs first (its local part may contain digits the
    phone pattern would nibble), then IPv4, then phone over whatever
    digits remain — the order is part of the op's contract."""
    t = F.col(text_col)
    for name, pat in _PATTERNS:
        t = F.regexp_replace(t, pat, f"<{name.upper()}>")
    return df.select(F.col(id_col), t.alias("text"))
