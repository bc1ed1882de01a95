"""Text-analysis column expressions — JVM-side only (no Python UDFs).

Everything here compiles to Catalyst expressions inside whole-stage
codegen, so these run at scan speed on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "und", "die", "das", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "una", "por"],
}


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ws_tokens(col: str | Column) -> Column:
    """Whitespace tokens (keeps empties — mirror of split semantics)."""
    return F.split(_c(col), " ", -1)


def alnum_tokens(col: str | Column) -> Column:
    """BPE-ish tokens: maximal [a-z0-9] runs, case-insensitive input."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit("[a-z0-9]+"), 0)


def normalize_ws(col: str | Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(_c(col))), r"\s+", " ")


def fingerprint(col: str | Column) -> Column:
    """Canonical document fingerprint: md5 of the sorted distinct token
    set (OpenRefine-style key collision fingerprint)."""
    toks = F.split(F.lower(F.trim(_c(col))), r"\s+", -1)
    canon = F.array_join(F.sort_array(F.array_distinct(toks)), " ")
    return F.md5(F.encode(canon, "UTF-8"))


def stopword_count(tokens: Column, stopwords: list[str] | None = None) -> Column:
    words = stopwords or STOPWORDS
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


# --------------- no-whitespace-script (CJK) tokenization -------------------
#
# Whitespace tokenization silently under-counts Chinese/Japanese/Korean
# text (no spaces between words). The standard engine fallback (the
# Lucene CJK analyzer shape) is overlapping CHARACTER BIGRAMS over
# runs of no-space-script characters, with alphanumeric runs still
# tokenizing as words. Everything below stays JVM-side (regex +
# higher-order array functions inside codegen) — no Python UDF.

# CJK Unified Ideographs, Hiragana+Katakana, Hangul syllables
CJK_CLASS = "\u4e00-\u9fff\u3040-\u30ff\uac00-\ud7a3"


def cjk_runs(col: str | Column) -> Column:
    """Maximal runs of no-space-script characters."""
    return F.regexp_extract_all(_c(col), F.lit(f"[{CJK_CLASS}]+"), 0)


def cjk_char_count(col: str | Column) -> Column:
    """Total no-space-script characters (sum of run lengths)."""
    return F.aggregate(
        cjk_runs(col),
        F.lit(0),
        lambda acc, r: acc + F.length(r),
    )


def cjk_char_bigrams(col: str | Column) -> Column:
    """Overlapping char bigrams per CJK run (len-1 bigrams per run; a
    single isolated char stays a 1-char token) — the CJK analyzer
    tokenization, as one nested higher-order expression."""
    return F.flatten(
        F.transform(
            cjk_runs(col),
            lambda r: F.when(F.length(r) == 1, F.array(r)).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.length(r) - 1),
                    lambda i: r.substr(i, F.lit(2)),
                )
            ),
        )
    )


def mixed_script_tokens(col: str | Column) -> Column:
    """CJK-aware tokens: alphanumeric word runs PLUS char bigrams over
    no-space-script runs — the fallback token stream for mixed or
    space-free corpora (token counts, mixture reports, vocab sizing)."""
    return F.concat(alnum_tokens(col), cjk_char_bigrams(col))


def no_space_script_ratio(col: str | Column) -> Column:
    """Detector: fraction of non-space characters that belong to a
    no-space script — key a char-n-gram tokenization fallback on this
    (e.g. ratio >= 0.3)."""
    nonspace = F.length(F.regexp_replace(_c(col), r"\s+", ""))
    return F.when(
        nonspace > 0,
        cjk_char_count(col).cast("double") / nonspace,
    ).otherwise(F.lit(0.0))
