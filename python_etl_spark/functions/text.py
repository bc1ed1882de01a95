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
