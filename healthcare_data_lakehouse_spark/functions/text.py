"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in Column expressions (JVM-side, whole-stage
codegen) — no Python UDFs: tokenization via ``split``, language ID via
marker regexes, quality scoring via length/punctuation/stopword ratios,
fingerprinting via ``md5``. Everything is a narrow per-row transform — no
shuffle — so throughput scales linearly with executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "punct_count",
    "stopword_count",
    "language_id",
    "quality_score_cols",
    "fingerprint",
    "STOPWORDS",
    "PUNCT_RE",
]

#: Small English stopword set used by the quality heuristic.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

PUNCT_RE = "[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split; the corpus format)."""
    return F.split(text, " ", -1)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def punct_count(text: Column) -> Column:
    # length-difference trick: portable to engines without regexp_count
    return F.length(text) - F.length(F.regexp_replace(text, PUNCT_RE, ""))


def stopword_count(text: Column) -> Column:
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))


def language_id(text: Column) -> Column:
    """Marker-based language heuristic (n-gram-lite).

    Checks, in order: CJK codepoints -> zh; Cyrillic -> ru; Spanish
    markers -> es; German markers -> de; French markers -> fr; English
    stopwords -> en; otherwise 'und' (undetermined). Deterministic
    first-match precedence; one regex pass per class.
    """
    t = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return (
        F.when(text.rlike("[\\u4e00-\\u9fff]"), F.lit("zh"))
        .when(text.rlike("[\\u0400-\\u04ff]"), F.lit("ru"))
        .when(t.rlike(" (el|la|los|las|es|una|uno|que) "), F.lit("es"))
        .when(t.rlike(" (der|die|das|und|ist|nicht) "), F.lit("de"))
        .when(t.rlike(" (le|les|des|est|une|dans) "), F.lit("fr"))
        .when(t.rlike(" (the|a|of|and|to|is|it) "), F.lit("en"))
        .otherwise(F.lit("und"))
    )


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Length/punct/stopword quality heuristic.

    score = 0.4*min(1, tokens/100) + 0.3*(1 - punct_ratio)
          + 0.3*min(1, 4*stopword_ratio); all ratios guarded for empties.
    """
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = punct_count(text)
    n_stop = stopword_count(text)
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    score = (
        0.4 * F.least(F.lit(1.0), n_tokens.cast("double") / 100)
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * F.least(F.lit(1.0), 4.0 * stop_ratio)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text. Content-addressed identity for exact dedup and incremental
    re-crawl detection."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), "\\s+", " ")
    return F.md5(normalized)
