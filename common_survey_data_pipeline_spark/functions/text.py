"""Text-analysis column expressions — all JVM-side built-ins, no UDFs.

Every function here returns a ``pyspark.sql.Column`` built from
whole-stage-codegen-friendly primitives (split/filter/transform/
aggregate), so plans stay vectorized at 100 TB. Each has a documented
ANSI-SQL equivalent used by the DuckDB oracles in ``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny public stopword lists for the language-ID heuristic (top function
#: words; enough signal for a deterministic n-gram/stopword classifier)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "you", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "fr": ("le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "les"),
    "de": ("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization with empty-token removal.

    SQL equivalent: ``list_filter(regexp_split_to_array(trim(x), '\\s+'),
    t -> t <> '')``.
    """
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def mean_token_length(col: Column) -> Column:
    """Average token length as double (NULL for zero tokens)."""
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return (total.cast("double") / F.nullif(F.size(toks), F.lit(0))).cast("double")


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are neither word characters nor
    whitespace. SQL: same double regexp_replace construction."""
    stripped = F.regexp_replace(col, r"[\w\s]", "")
    return (F.length(stripped).cast("double") / F.nullif(F.length(col), F.lit(0)))


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are (lang) stopwords."""
    toks = tokens(F.lower(col))
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.nullif(F.size(toks), F.lit(0))


def quality_score(col: Column) -> Column:
    """Deterministic composite quality heuristic in [0, 1]:
    rewards reasonable length and stopword presence, penalizes
    punctuation soup. The exact formula is the contract (mirrored in the
    DuckDB oracle); it is a heuristic, not a model.

    The token array is evaluated once via ``_bind`` — the naive
    composition re-tokenizes the text for each sub-score."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])

    def score(t: Column) -> Column:
        n_tok = F.size(t).cast("double")
        len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
        hits = F.size(F.filter(t, lambda x: F.array_contains(sw, F.lower(x))))
        sw_ratio = hits.cast("double") / F.nullif(F.size(t), F.lit(0))
        sw_score = F.least(F.coalesce(sw_ratio, F.lit(0.0)) * 4.0, F.lit(1.0))
        punct_pen = F.least(F.coalesce(punct_ratio(col), F.lit(0.0)) * 2.0, F.lit(1.0))
        # clamp at 0: pure punctuation soup (len/sw scores ~0, full
        # penalty) would otherwise reach -0.25, breaking the documented
        # [0, 1] range and any downstream use of the score as a weight
        return F.round(
            F.greatest(
                F.lit(0.0),
                0.5 * len_score + 0.5 * sw_score - 0.25 * punct_pen,
            ),
            6,
        )

    return _bind(tokens(col), score)


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-overlap counts over the distinct token set."""
    toks = F.array_distinct(tokens(F.lower(col)))
    out = {}
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.array_intersect(toks, sw))
    return out


def lang_id(col: Column) -> Column:
    """Argmax language by stopword overlap; ties break alphabetically;
    zero overlap → 'unknown'. Deterministic, SQL-mirrorable."""
    scores = lang_scores(col)
    langs = sorted(scores)  # alphabetical tiebreak
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("unknown")
    # build reversed so earlier (alphabetical) languages win ties
    for lang in reversed(langs):
        expr = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def _bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE and pass it to ``fn`` as a bound variable.

    Catalyst does no common-subexpression elimination across
    higher-order-function lambda boundaries: an array expression
    referenced inside a ``transform`` lambda is re-evaluated per
    element (measured: word_shingles over 5k docs went 5.6s → 0.6s
    from this fix). Wrapping the expression as the single element of an
    array and transforming over it binds the evaluated value to the
    lambda variable, which IS shared.
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined by single spaces; empty array when
    fewer than n tokens.

    SQL: ``case when len(toks) < n then [] else list_distinct([...]) end``.
    """
    return _bind(
        tokens(col),
        lambda t: F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(t, i, n)),
                )
            )
        ),
    )


def word_ngrams(col: Column, n: int = 2) -> Column:
    """ALL word n-grams in document order (NOT deduplicated — unlike
    :func:`word_shingles`); empty array when fewer than n tokens.

    The multiset form is what repetition metrics need: a 2-gram that
    occurs 9 times must contribute 9 entries, not 1.

    SQL: ``case when len(toks) < n then [] else
    [toks[i] || ' ' || ... for i in range(1, len(toks) - n + 2)] end``.
    """
    return _bind(
        tokens(col),
        lambda t: F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            )
        ),
    )


def char_shingles(col: Column, k: int = 5) -> Column:
    """Distinct character k-grams; empty array for strings shorter than k.

    The source string is a plain column reference (cheap per-element
    re-read), so no ``_bind`` is needed here."""
    grams = F.transform(
        F.sequence(F.lit(1), F.length(col) - (k - 1)),
        lambda i: F.substring(col, i, k),
    )
    return F.when(F.length(col) < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(grams)
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two (distinct-element) arrays, 0.0 when the
    union is empty."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_distinct(F.concat(a, b)))
    return F.coalesce(inter / F.nullif(union.cast("double"), F.lit(0.0)), F.lit(0.0))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: splits on whitespace AND on
    letter/digit/other boundaries (a cheap BPE stand-in for LLM budget
    estimation). SQL-mirrorable via the same regexp."""
    pieces = F.split(
        F.regexp_replace(
            F.regexp_replace(col, r"(\d+)", r" $1 "),
            r"([^\w\s]+)",
            r" $1 ",
        ),
        r"\s+",
    )
    return F.size(F.filter(pieces, lambda t: t != ""))


#: PII patterns shared by the Spark expressions below and the DuckDB
#: oracle SQL in ``workload.py`` — restricted to syntax with identical
#: semantics in Java regex (Spark) and RE2 (DuckDB): no backreferences,
#: no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d[\d-]{7,}\d",
}


def redact_pii(col: Column) -> Column:
    """Replace email / IPv4 / phone-number spans with typed placeholder
    tags. Order matters: emails first (their domains contain dots that
    the IPv4 pattern must not see), then IPs, then phones. All JVM-side
    ``regexp_replace`` — no UDF, safe in a 100 TB scan stage."""
    out = F.regexp_replace(col, PII_PATTERNS["email"], "<EMAIL>")
    out = F.regexp_replace(out, PII_PATTERNS["ipv4"], "<IP>")
    return F.regexp_replace(out, PII_PATTERNS["phone"], "<PHONE>")


def pii_count(col: Column) -> Column:
    """Number of PII spans that ``redact_pii`` would replace."""
    total = F.lit(0)
    scrubbed = col
    for tag in ("email", "ipv4", "phone"):
        total = total + F.size(
            F.regexp_extract_all(scrubbed, F.lit(PII_PATTERNS[tag]), 0)
        )
        scrubbed = F.regexp_replace(scrubbed, PII_PATTERNS[tag], " ")
    return total
