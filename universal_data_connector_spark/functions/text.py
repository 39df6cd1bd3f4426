"""Text-analysis column expressions for LLM-training-data pipelines.

All pure `pyspark.sql.functions` compositions (higher-order array
functions — `transform`, `filter`, `aggregate` — run JVM-side), so every
one of these is a projection that scales linearly and survives 100 TB:
no shuffle, no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword lists for the n-gram/stopword language
# heuristic. Deliberately tiny: the heuristic's contract is "cheap,
# deterministic, order-of-magnitude right", not model-grade LID.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "sur"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "para", "con"],
}


def bind_once(expr: Column, build) -> Column:
    """Evaluate ``expr`` exactly once per row and pass the bound value
    to ``build`` (λ-binding via a one-element ``transform``).

    Catalyst collapses adjacent Projects and re-inlines aliased
    subexpressions, and higher-order array functions run interpreted
    (outside whole-stage codegen's subexpression elimination) — so an
    expression like ``word_ngrams(tokenize(text))`` re-runs the full
    lower/trim/split pipeline once per syntactic reference (4× in the
    shingle projection). Binding the heavy subexpression as a lambda
    variable pins single evaluation without a materialization barrier.
    """
    return F.element_at(F.transform(F.array(expr), build), 1)


def tokenize(col: Column, lowercase: bool = True) -> Column:
    """Whitespace tokenization -> array<string> (empty tokens dropped)."""
    c = F.lower(col) if lowercase else col
    toks = F.split(F.trim(c), r"\s+")
    return F.filter(toks, lambda t: t != "")


def regex_token_count(col: Column, pattern: str = r"[a-z]+|[0-9]+|[^a-z0-9\s]") -> Column:
    """BPE-ish token count: number of regex matches over the lowered text.

    The default pattern approximates a byte-pair pre-tokenizer's word /
    number / punctuation split. Uses only regex constructs shared by
    Java regex and RE2 so oracles can mirror it.
    """
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), F.lit(0))).cast("bigint")


def word_ngrams(tokens: Column, n: int = 5) -> Column:
    """Distinct word n-grams (space-joined) from a token array.

    ``transform(sequence(...))`` is evaluated per row JVM-side; the
    result feeds shingle-based dedup (MinHash / Jaccard).

    Note Spark's ``sequence(1, 0)`` is a DESCENDING [1, 0], not empty —
    short inputs must short-circuit to an empty array explicitly.
    """
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    return F.when(F.size(tokens) >= n, F.array_distinct(grams)) \
            .otherwise(F.array().cast("array<string>"))


def char_ngrams(col: Column, n: int = 5) -> Column:
    """Distinct character n-grams of the raw string."""
    idx = F.sequence(F.lit(1), F.length(col) - (n - 1))
    grams = F.transform(idx, lambda i: F.substring(col, i, n))
    return F.when(F.length(col) >= n, F.array_distinct(grams)) \
            .otherwise(F.array().cast("array<string>"))


def _stopword_hits(tokens: Column, words: list[str]) -> Column:
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(wordset, t)))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of `lang` (0.0 if empty)."""
    toks = tokenize(col)
    hits = _stopword_hits(toks, STOPWORDS[lang])
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks).cast("double")).otherwise(F.lit(0.0))


def language_id(col: Column) -> Column:
    """Heuristic language ID: argmax stopword-hit count across languages.

    A positive-hit tie resolves to the EARLIEST language in STOPWORDS
    (insertion order = priority); only the all-zero case resolves to
    'unknown'. Returns string codes from STOPWORDS plus 'unknown' —
    this exact contract is what the text_language_id oracle mirrors,
    so do not change the tie rule without changing the oracle.
    This is the cheap
    n-gram/stopword heuristic a 100 TB pre-filter wants — exact LID is a
    downstream model's job.
    """
    toks = tokenize(col)
    langs = list(STOPWORDS)  # insertion order = tie priority
    # argmax as array_max over (hits, priority, lang) structs: structs
    # compare field-by-field, so higher hits wins and earlier languages
    # win ties. A when-chain fold would duplicate every hit-count
    # subtree ~2^langs times in the expression tree (measured ~5x
    # slower at sf0.1); here each count appears exactly once.
    entries = [
        F.struct(_stopword_hits(toks, STOPWORDS[lang]).alias("hits"),
                 F.lit(len(langs) - i).alias("prio"),
                 F.lit(lang).alias("lang"))
        for i, lang in enumerate(langs)]
    best = F.array_max(F.array(*entries))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown"))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[^\.,;:!\?]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite document-quality heuristic in [0, 1].

    mean(length component, stopword component, punctuation component):
    * length: min(n_chars / 500, 1) — favors non-trivially-short docs,
    * stopwords: min(stopword_ratio * 5, 1) — natural prose has them,
    * punctuation: 1 - min(punct_ratio * 10, 1) — punctuation soup is bad.
    """
    len_c = F.least(F.length(col).cast("double") / F.lit(500.0), F.lit(1.0))
    stop_c = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_c = F.lit(1.0) - F.least(punct_ratio(col) * 10.0, F.lit(1.0))
    return (len_c + stop_c + punct_c) / F.lit(3.0)


def normalize_text(col: Column) -> Column:
    """Dedup normalization: lower, collapse whitespace, strip."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def text_fingerprint(col: Column) -> Column:
    """Deterministic 256-bit document fingerprint over normalized text.

    sha2 of the normalized text — the cheap exact-dedup key. (A rolling
    / content-defined chunk hash lives in operators/dedup.py where it
    has the shingle context it needs.)
    """
    return F.sha2(normalize_text(col), 256)


# PII patterns shared by the redaction op and its oracle. Kept to
# syntax with identical semantics in Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, no backreferences
# or lookaround.
PII_PATTERNS: dict[str, str] = {
    "EMAIL": r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}",
    "SSN": r"\b\d{3}-\d{2}-\d{4}\b",
    "PHONE": r"\b\d{3}-\d{3}-\d{4}\b",
    "IPV4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(col: Column, kinds: list[str] | None = None) -> Column:
    """Replace each PII match with its [KIND] tag, in PII_PATTERNS
    order (EMAIL before PHONE: an email can embed digit runs, and
    replacement order is part of the contract). Pure regexp_replace
    chain — JVM-side, codegen-friendly, linear per document."""
    out = col
    for kind in kinds or list(PII_PATTERNS):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind}]")
    return out


def pii_counts(col: Column, kinds: list[str] | None = None) -> dict[str, Column]:
    """Per-kind match counts (bigint) for audit metrics."""
    return {kind: F.regexp_count(col, F.lit(PII_PATTERNS[kind])).cast("bigint")
            for kind in kinds or list(PII_PATTERNS)}
