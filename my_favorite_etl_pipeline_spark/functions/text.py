"""Text-analysis building blocks ([EXT] X4, SURVEY.md §2.9).

Everything is built from native column expressions (split/higher-order
functions/regex) — no Python UDFs — so the operators stay inside Catalyst
codegen and scale linearly with the corpus. Driver mandate: language-ID,
quality scoring, token counting, document fingerprinting for an LLM
training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Real pipelines plug in fastText/CLD3 via a Pandas UDF; the
# heuristic keeps the operator UDF-free and oracle-checkable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "les", "des", "une"),
    "zh": ("de5", "shi4", "le5", "zai4"),
}

STOPWORDS: tuple[str, ...] = ("a", "the", "and", "of", "to", "in")

# BPE-ish word/number/punctuation splitter: runs of letters, runs of digits,
# or single non-space symbols — a cheap stand-in for a real tokenizer's
# pre-tokenization regex.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the corpus is space-separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_tokens(col: Column | str) -> Column:
    """Regex pre-tokenization — ``regexp_extract_all`` stays JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def ngrams(col: Column | str, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity — the unit for repetition metrics
    (duplicate-gram fractions need occurrence counts, so no dedup here).

    Built with sequence+transform over the token array: one pass, no
    explode, no shuffle; the array stays inside the row. The token array is
    let-bound (see functions.exprs) so the per-gram element_at lookups share
    one split() evaluation.
    """
    from .exprs import let

    return let(
        tokens(col),
        lambda toks: F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles — the MinHash/Jaccard unit."""
    return F.array_distinct(ngrams(col, n))


def stopword_count(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(tokens(col), lambda t: t.isin(*stopwords)))


def distinct_token_ratio(col: Column | str) -> Column:
    """Lexical diversity: distinct/total tokens — low values flag boilerplate."""
    toks = tokens(col)
    return F.size(F.array_distinct(toks)) / F.size(toks)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-hit count per candidate language (the n-gram LID heuristic)."""
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


PII_PATTERNS: tuple[tuple[str, str], ...] = (
    # order matters: URLs before emails (URLs may embed @); simple RE2-safe
    # character classes so the DuckDB oracle applies the identical regex
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9() -]{7,}[0-9]", "<PHONE>"),
)


def scrub_pii(col: Column | str) -> Column:
    """Training-data PII redaction: URLs, emails, phone-shaped numbers →
    typed placeholder tokens. A chain of native regexp_replace — codegen'd,
    no UDF; real pipelines extend PII_PATTERNS, the dataflow is identical."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 is bit-identical across engines (unlike xxhash/murmur), which keeps
    the dedup-by-fingerprint operator oracle-checkable end to end.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(c)))
