"""Text-analysis scalar functions — all JVM-side Catalyst expressions.

The building blocks for the LLM-data-pipeline operators (dedup, quality
filtering, language ID, fingerprinting). Everything here is a pure
column expression over built-in string/array/regexp functions: no UDFs,
no shuffles, fully codegen'd, so these run at scan speed over 100 TB of
documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalized_text",
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "word_shingles",
    "bind_once",
    "char_shingles",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
]

# A word-ish tokenizer: runs of letters, runs of digits, or a single
# other non-space symbol — a deterministic approximation of BPE-style
# pre-tokenization that both Spark (Java regex) and ANSI-SQL engines
# (RE2 etc.) interpret identically.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Minimal per-language stopword marker sets for the n-gram/stopword
# language heuristic. Deliberately tiny and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "des"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "los", "es", "una", "que", "por", "con", "para"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "an", "for", "on", "with", "as", "this"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalized_text(col: Column | str) -> Column:
    """Canonical form for near-dup comparison: lowercase, collapse all
    whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"[ \t\n\x0B\f\r]+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (``array<string>``,
    empty array for empty/blank input)."""
    norm = normalized_text(col)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (letter runs / digit runs / symbols)
    — a cheap, model-free token-budget estimator."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0))


def bind_once(value: Column, body) -> Column:
    """Bind ``value`` to a lambda variable and evaluate ``body`` over
    it ONCE PER ROW — the transform-over-single-element-array idiom.

    Why this exists (round-14 measurement): an expression referenced
    inside a higher-order-function lambda is RE-EVALUATED PER ELEMENT
    — CollapseProject inlines any alias right back into the lambda, so
    there is no way to materialize it with a projection. For
    char_shingles that meant the normalized_text regexp ran once per
    GRAM (~290x per row; text_fingerprint measured 15.2 s -> 2.3 s at
    sf0.1 from this change alone). A lambda VARIABLE, by contrast, is
    bound once when the enclosing transform evaluates its input."""
    return F.element_at(F.transform(F.array(value), body), 1)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text, as
    ``array<string>`` of space-joined shingles. Texts shorter than *n*
    words yield the whole (normalized) text as a single shingle so every
    non-empty document has ≥1 shingle."""

    def body(tk: Column) -> Column:
        k = F.size(tk)
        grams = F.transform(
            F.sequence(F.lit(0), k - n),
            lambda i: F.array_join(F.slice(tk, i + 1, n), " "),
        )
        return F.when(k >= n, F.array_distinct(grams)).otherwise(
            F.when(k > 0, F.array(F.array_join(tk, " "))).otherwise(
                F.array().cast("array<string>")
            )
        )

    # tokens() (a regexp + split) is bound once per row — inside the
    # gram lambda it would re-run per shingle (see bind_once).
    return bind_once(tokens(col), body)


def char_shingles(col: Column | str, n: int = 8) -> Column:
    """Distinct character n-grams of the normalized text."""

    def body(nm: Column) -> Column:
        length = F.length(nm)
        grams = F.transform(
            F.sequence(F.lit(1), length - n + 1),
            lambda i: F.substring(nm, i, n),
        )
        return F.when(length >= n, F.array_distinct(grams)).otherwise(
            F.when(length > 0, F.array(nm)).otherwise(
                F.array().cast("array<string>")
            )
        )

    # normalized_text (a regexp) is bound once per row — inside the
    # gram lambda it would re-run per gram (see bind_once).
    return bind_once(normalized_text(col), body)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric or whitespace.
    0.0 for empty text."""
    c = _c(col)
    total = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of whitespace tokens that are common English stopwords.
    0.0 for empty text."""
    toks = tokens(col)
    stop = F.array([F.lit(w) for w in STOPWORDS_EN])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]:

      0.4 · length_term  (saturating at 200 tokens)
    + 0.3 · (1 − punct_ratio clamped at 0.5, rescaled)
    + 0.3 · stopword_term (saturating at ratio 0.4)

    Deterministic, closed-form, and expressible in ANSI SQL — designed
    as a filterable pretraining-quality signal, not a learned model.
    """
    n_tok = token_count(col).cast("double")
    length_term = F.least(n_tok / F.lit(200.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col), F.lit(0.5)) / F.lit(0.5)
    stop_term = F.least(stopword_ratio(col) / F.lit(0.4), F.lit(1.0))
    return (
        F.lit(0.4) * length_term + F.lit(0.3) * punct_term + F.lit(0.3) * stop_term
    )
