"""Text-analysis functions for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All pure built-in column expressions (JVM-side, whole-stage codegen) —
deliberately SQL-expressible so every one has a DuckDB oracle in the
driver's correctness gate. Heuristics are deterministic and simple by
design: at 10^12 documents the cost model matters more than marginal
accuracy, and each function is a single narrow projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic marker dictionaries (stopword-style) per language
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "des"],
    "es": ["el", "los", "las", "es", "una", "que", "de", "por"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavored proxy: word-piece count estimated as words plus one
    extra piece per 6 chars of long words (deterministic, regex-only)."""
    words = tokens(text)
    pieces = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc + F.lit(1) + F.floor(F.length(w) / F.lit(6)).cast("int"),
    )
    return pieces


def marker_hits(text: Column, markers: list[str]) -> Column:
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(text: Column) -> Column:
    """Argmax of marker-word hits; ties resolved in fixed key order
    (array_position returns the FIRST maximum); no hits at all → 'und'
    (undetermined).

    Built as one hits ARRAY + array_max/array_position rather than an
    iterative when-chain: the chain nested each hit expression inside
    the next comparison with multiplicity doubling per language, and
    this runs in an interpreted Project (no CSE) — the array form
    evaluates the five split/filter passes ~3x per row instead of
    ~2^5 times."""
    langs = list(LANG_MARKERS)  # fixed order => deterministic tie-break
    hits = F.array(*[marker_hits(text, LANG_MARKERS[l]) for l in langs])
    mx = F.array_max(hits)
    return F.when(
        mx > 0,
        F.element_at(
            F.array(*[F.lit(l) for l in langs]), F.array_position(hits, mx).cast("int")
        ),
    ).otherwise(F.lit("und"))


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column, markers: list[str] | None = None) -> Column:
    ms = markers or LANG_MARKERS["en"]
    n = token_count(text)
    return F.when(n > 0, marker_hits(text, ms) / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length sweet spot, low punctuation,
    presence of function words. Rounded to 6dp for cross-engine equality."""
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    return F.round(
        len_score * 0.4 + punct_score * 0.3 + stop_score * 0.3, 6
    )


def doc_fingerprint(text: Column) -> Column:
    """Stable content fingerprint: md5 of whitespace-normalized lowercase
    text — the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUM_RE = r"\d{9,}"


def redact_pii(text: Column) -> Column:
    """Scrub obvious PII lexemes: email addresses → <EMAIL>, 9+-digit
    runs (phone/account numbers) → <NUM>. Simple deliberately — the
    production pass chains more patterns; each is one regexp_replace
    (JVM regex, whole-stage codegen) and SQL-portable."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, LONG_NUM_RE, "<NUM>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_long_numbers) found in the text."""
    return (
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0))),
        F.size(F.regexp_extract_all(text, F.lit(LONG_NUM_RE), F.lit(0))),
    )


def dup_ngram_fraction(toks: Column, n: int = 2) -> Column:
    """Gopher-style repetition signal: fraction of word n-grams that are
    repeats of an earlier n-gram in the SAME document —
    1 - distinct/total. 0.0 for docs with no n-grams. Pure array
    expressions, no explode.

    Takes a TOKEN-ARRAY column (lowercased), not text: the slice lambda
    is interpreted, so an inline tokenize would re-split the text per
    gram position — materialize tokens(lower(text)) as a named column
    first (operators/corpus.repetition_stats does)."""
    # guard: sequence(0, -1) DESCENDS in Spark, so short/empty docs must
    # short-circuit to an empty gram list instead
    # n is a Python int: unroll the window to n element_at calls —
    # identical strings to array_join(slice(...)), no per-gram slice
    # array allocation (round 6; measured on the shingle twin:
    # 1.19-1.82 → 0.58-0.69 s at sf1)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k + 1) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # LET-BIND the gram array (PLANS §16): the ratio references it
    # three times and projections have no CSE — unbound, the O(tokens·n)
    # gram build ran 3x per row
    return F.get(
        F.transform(
            F.array(grams),
            lambda g: F.when(
                F.size(g) > 0,
                F.lit(1.0) - F.size(F.array_distinct(g)) / F.size(g),
            ).otherwise(F.lit(0.0)),
        ),
        F.lit(0),
    )
