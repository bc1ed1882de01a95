"""Data-layout optimization: Z-order (Morton) clustering.

Sorting a table by the bit-interleaved code of two columns places rows
that are close in BOTH dimensions into the same files, so per-file
min/max statistics become tight bounding boxes and a predicate on
EITHER column prunes most files — the Delta/Iceberg OPTIMIZE ZORDER
layout, expressed as plain repartitionByRange + sortWithinPartitions.
A single-column sort gives perfect pruning on one column and none on
the other; Z-order trades a little of the first for most of the second.

All arithmetic is constant-shift bitwise ops (whole-stage codegen;
integer-exact, so the code column is hash-checkable cross-engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread(c: Column) -> Column:
    """Insert a zero between consecutive bits of a 16-bit value
    (classic magic-mask bit spread -> 32-bit result)."""
    c = c.cast("long")
    for shift, mask in _MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: a takes
    the even bit positions, b the odd ones."""
    lim = F.lit((1 << bits) - 1)
    return _spread(a.cast("long").bitwiseAND(lim)).bitwiseOR(
        F.shiftleft(_spread(b.cast("long").bitwiseAND(lim)), 1)
    )


def morton_code_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB expression computing the identical code (same constant
    shifts and masks; ``<<``/``&``/``|`` on BIGINT)."""

    def spread(x: str) -> str:
        e = f"CAST({x} AS BIGINT) & {(1 << bits) - 1}"
        for shift, mask in _MASKS:
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    return f"({spread(a)} | ({spread(b)} << 1))"


def zorder_by(
    df: DataFrame, col_a: str, col_b: str, n_files: int = 8
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the Morton code of
    (col_a, col_b) into ``n_files`` output partitions, sort within each
    — one shuffle, and every output file covers a compact Z-curve
    segment (tight min/max on BOTH columns)."""
    coded = df.withColumn("__z", morton_code(F.col(col_a), F.col(col_b)))
    return (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


_UNSPREAD = (
    (1, 0x33333333),
    (2, 0x0F0F0F0F),
    (4, 0x00FF00FF),
    (8, 0x0000FFFF),
)


def _unspread(c: Column) -> Column:
    """Inverse of _spread: collect the even bits of a 32-bit value back
    into 16 contiguous bits (the mirror magic-mask sequence)."""
    c = c.cast("long").bitwiseAND(F.lit(0x55555555))
    for shift, mask in _UNSPREAD:
        c = (c.bitwiseOR(F.shiftright(c, shift))).bitwiseAND(F.lit(mask))
    return c


def morton_decode(code: Column, bits: int = 16) -> tuple[Column, Column]:
    """Invert morton_code: (a, b) from the interleaved code — the
    round-trip makes the clustering key auditable (and is
    property-tested in tests/test_bucketing.py)."""
    return _unspread(code), _unspread(F.shiftright(code.cast("long"), 1))
