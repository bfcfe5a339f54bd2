"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting. All pure
``pyspark.sql.functions`` column expressions — JVM-side, codegen'd,
no Python in the hot path — so they run unchanged over 100 TB of
documents.

Cross-engine determinism notes (these back DuckDB-oracle checks):
- regex only uses constructs common to Java regex and RE2
  (character classes, \\b, alternation — no backrefs/lookahead);
- no transcendental math (exp/log differ by ulps across libm);
  quality_score is rational arithmetic only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic. Order matters: ties resolve to the earlier language.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "que"),
    "zh": ("de", "le", "shi", "bu", "wo", "ni", "ta", "men"),
}

# BPE-ish tokenization: letter runs, single digits, or single
# non-alphanumeric marks — a common pre-tokenizer shape.
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

WHITESPACE = r"\s+"


def word_count(text: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text (both Spark and
    DuckDB split a blank string into one empty token — guard it)."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, WHITESPACE))
    )


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (regexp matches)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_PATTERN))


def stopword_count(text: Column | str, lang: str = "en") -> Column:
    """Occurrences of the language's stopwords as whole words."""
    c = F.col(text) if isinstance(text, str) else text
    pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pat))


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(r"[^\w\s]"))


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    stripped = F.regexp_replace(lowered, r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (The reference has no fingerprinting; rolling-hash shingles live
    in operators/dedup.py — this is the whole-document variant.)"""
    return F.md5(normalize_text(text))


def quality_score(text: Column | str) -> Column:
    """Heuristic quality score in [0,1], rational arithmetic only:
    40% length saturation (words/200 capped), 30% stopword ratio
    saturation, 30% low-punctuation bonus."""
    c = F.col(text) if isinstance(text, str) else text
    n_words = word_count(c).cast("double")
    length_term = F.least(n_words / F.lit(200.0), F.lit(1.0))
    stop_ratio = F.when(
        n_words > 0, stopword_count(c).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    stop_term = F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
    n_chars = F.length(c).cast("double")
    punct_ratio = F.when(
        n_chars > 0, punct_count(c).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_term + F.lit(0.3) * stop_term + F.lit(0.3) * punct_term
    )


def lang_scores(text: Column | str) -> dict[str, Column]:
    return {lang: stopword_count(text, lang) for lang in LANG_STOPWORDS}


def detect_lang(text: Column | str) -> Column:
    """Stopword-vote language ID: ordered when-chain, so ties resolve
    to the first language in LANG_STOPWORDS order ('und' when no
    votes) — the exact semantics of an ordered SQL CASE, which the
    oracle mirrors."""
    scores = lang_scores(text)
    langs = list(scores)
    expr = None
    for lang in langs:
        cond = scores[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


# --- Gopher/C4-style repetition & format metrics ----------------------------
#
# Per-document repetition signals (the "remove documents that repeat
# themselves" family of pretraining filters), computed entirely with
# array expressions — a pure narrow map, no explode, no shuffle: the
# right 100 TB shape for bounded-length documents. (For very long
# documents the O(L^2) distinct-count-in-array step should switch to
# an explode + groupBy(doc, ngram) path; at typical web-doc lengths
# the shuffle-free form wins.) All metrics are count ratios — exact
# rational arithmetic, engine-portable.


def word_array(text: Column | str) -> Column:
    """Normalized word list; empty array (not ['']) for blank text."""
    c = F.col(text) if isinstance(text, str) else text
    norm = normalize_text(c)
    return F.when(
        F.length(norm) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(norm, " "))


def ngram_array(words: Column, n: int) -> Column:
    """Space-joined word n-grams; empty when fewer than n words."""
    return F.when(
        F.size(words) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )


def dup_ratio(arr: Column) -> Column:
    """Fraction of elements that are repeats of an earlier element:
    (len - distinct) / len; NULL for empty arrays."""
    return F.when(
        F.size(arr) > 0,
        (F.size(arr) - F.size(F.array_distinct(arr))) / F.size(arr),
    )


def top_mass(arr: Column) -> Column:
    """Fraction of the array occupied by its single most frequent
    element (Gopher's top-n-gram-mass rule); NULL for empty arrays.

    O(len²) INTERPRETED lambda evals — fine for short arrays in a
    filter predicate, but for corpus-wide scoring use the explode +
    groupBy(id, elem) shape instead (see q_repetition_metrics, which
    dropped from ~20 s to ~1 s at sf0.1 by switching)."""
    counts = F.transform(
        F.array_distinct(arr),
        lambda x: F.size(F.filter(arr, lambda y: y == x)),
    )
    return F.when(F.size(arr) > 0, F.array_max(counts) / F.size(arr))


def mean_word_length(words: Column) -> Column:
    """Average word length; NULL for empty arrays. Integer-sum /
    integer-count division — deterministic across engines.

    Interpreted-lambda fold: O(len) per row. When the words came from
    a single-space-normalized string, prefer the closed form
    ``(length(norm) - (n_words - 1)) / n_words`` — no lambda at all."""
    total = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return F.when(F.size(words) > 0, total / F.size(words))


# --- PII / contact scrubbing ------------------------------------------------
#
# Pretraining corpora scrub contact info before anything ships. The
# patterns deliberately use only the regex subset Java (Spark) and
# RE2 (DuckDB) implement identically — character classes and bounded
# quantifiers, no backreferences, no lookaround, no \b.

# (?i) — inline case-insensitivity is in the Java/RE2 common subset;
# without it 'John.Doe@Gmail.com' sails through redaction unharmed.
EMAIL_PATTERN = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_PATTERN = r"555-[0-9]{4}"


def redact_contacts(text: Column | str) -> Column:
    """Replace emails then phone-shaped strings with typed tokens."""
    c = F.col(text) if isinstance(text, str) else text
    no_email = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_PATTERN, "<PHONE>")


def contact_counts(text: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) found by the same patterns."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.regexp_count(c, F.lit(EMAIL_PATTERN)),
        F.regexp_count(c, F.lit(PHONE_PATTERN)),
    )


# --- Markup stripping -------------------------------------------------------
#
# Web-extracted pretraining text arrives tag-ridden; the cleaner is a
# regex pipeline (tags -> entity decode -> whitespace collapse) kept
# to the Java/RE2-common regex subset so the DuckDB oracle runs the
# very same patterns. Entity decode replaces the named entities FIRST
# and '&amp;' LAST so '&amp;lt;' decodes to the literal '&lt;' (one
# level, no double-decode) — the order HTML serializers assume.

TAG_PATTERN = r"<[^>]*>"
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&amp;", "&")]


def strip_markup(text: Column | str) -> Column:
    """Markup-bearing string -> clean text: drop tags (replaced by a
    space so adjacent words don't fuse), decode the four core named
    entities, collapse runs of whitespace, trim."""
    c = F.col(text) if isinstance(text, str) else text
    out = F.regexp_replace(c, TAG_PATTERN, " ")
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def tag_count(text: Column | str) -> Column:
    """Number of markup tags in the string."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(TAG_PATTERN))
