"""Vector math over array<float> embedding columns — JVM expressions.

Cross-engine parity strategy: decimal casts of arbitrary floats diverge
between Spark (shortest-repr rounding) and DuckDB (binary rounding), so
vector math stays in plain double arithmetic with a SEQUENTIAL
left-to-right fold, and every exported similarity value is rounded to 6
decimals. Engine-order differences are ~1e-15 relative and vanish under
the rounding; orderings/thresholds are always applied to the rounded
value with an id tiebreak, so both engines make identical decisions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COSINE_SCALE = 6  # round similarity outputs to this many decimals


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(col: str | Column) -> Column:
    return _c(col).cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential left-to-right dot product of two double arrays."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot_unrolled(a: str, b: str, dim: int) -> Column:
    """dot() unrolled for a KNOWN fixed dimension: a left-associated
    sum chain seeded with the same 0.0 the fold starts from, so every
    intermediate double is BIT-IDENTICAL to dot() — but the expression
    is plain arithmetic over GetArrayItem, which whole-stage codegen
    compiles, where the higher-order aggregate/zip_with fold is
    interpreted (CodegenFallback).

    Caveats (why this is NOT the default dot):
    * Only safe when both arrays are schema-guaranteed >= dim elements:
      under ANSI mode a short array errors; under non-ANSI the access
      yields NULL, the whole product chain goes NULL and the row
      silently drops out of downstream top-k/threshold logic — unlike
      the fold, which sums over the actual length (ADVICE r14).
    * The generated whole-stage class is huge; its Janino+JIT compile
      (~0.2-0.7 s for three 64-term chains) is re-paid whenever
      Spark's ~100-entry generated-class cache has evicted it, so
      multi-query or cold workloads can regress (r14 driver bench).
      Use it only where one plan runs hot enough to amortize."""
    expr = "0.0D"
    for i in range(dim):
        expr = f"({expr} + ({a}[{i}] * {b}[{i}]))"
    return F.expr(expr)


def norm_sq(a: str | Column) -> Column:
    return dot(a, a)


def cosine_from_parts(dp: Column, norm_sq_a: Column, norm_sq_b: Column) -> Column:
    return F.round(dp / (F.sqrt(norm_sq_a) * F.sqrt(norm_sq_b)), COSINE_SCALE)


def cosine(a: str | Column, b: str | Column) -> Column:
    return cosine_from_parts(dot(a, b), norm_sq(a), norm_sq(b))


# Backwards-compatible names used by operators
dot_exact = dot
norm_sq_exact = norm_sq
cosine_exact = cosine
