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


def _check_bits(bits: int) -> None:
    """The magic-mask _spread sequence only spreads 16-bit values;
    larger inputs would silently mangle high bits into colliding
    Z-codes, so reject them loudly."""
    if not 1 <= bits <= 16:
        raise ValueError(
            f"bits must be in [1, 16] (the magic-mask spread is 16-bit); "
            f"got {bits}"
        )


def morton_code(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative ints: a takes
    the even bit positions, b the odd ones."""
    _check_bits(bits)
    lim = F.lit((1 << bits) - 1)
    return _spread(a.cast("long").bitwiseAND(lim)).bitwiseOR(
        F.shiftleft(_spread(b.cast("long").bitwiseAND(lim)), 1)
    )


def morton_code_sql(a: str, b: str, bits: int = 16) -> str:
    """DuckDB expression computing the identical code (same constant
    shifts and masks; ``<<``/``&``/``|`` on BIGINT)."""
    _check_bits(bits)

    def spread(x: str) -> str:
        e = f"CAST({x} AS BIGINT) & {(1 << bits) - 1}"
        for shift, mask in _MASKS:
            e = f"((({e}) | (({e}) << {shift})) & {mask})"
        return e

    return f"({spread(a)} | ({spread(b)} << 1))"


def _check_n(k: int, bits: int) -> None:
    if k < 2:
        raise ValueError(f"need at least 2 columns to interleave; got {k}")
    if bits < 1 or k * bits > 62:
        raise ValueError(
            f"k*bits must fit a positive BIGINT (k*bits <= 62); "
            f"got k={k}, bits={bits}"
        )


def morton_code_n(cols: list[Column], bits: int = 16) -> Column:
    """k-way bit interleave: bit i of column j lands at position
    i*k + j. For k=2 this dispatches to the magic-mask fast path
    (identical values — column 0 even positions, column 1 odd); for
    k>=3 it composes bits*k constant-shift terms, still integer-exact
    whole-stage-codegen arithmetic (48 ORs for three 16-bit columns —
    trivial next to a shuffle)."""
    k = len(cols)
    _check_n(k, bits)
    if k == 2:
        _check_bits(bits)
        return morton_code(cols[0], cols[1], bits)
    lim = F.lit((1 << bits) - 1)
    masked = [c.cast("long").bitwiseAND(lim) for c in cols]
    code = F.lit(0).cast("long")
    for i in range(bits):
        for j, m in enumerate(masked):
            bit = F.shiftright(m, i).bitwiseAND(F.lit(1))
            code = code.bitwiseOR(F.shiftleft(bit, i * k + j))
    return code


def morton_code_n_sql(names: list[str], bits: int = 16) -> str:
    """DuckDB expression computing the identical k-way code (same
    bit-placement rule; ``>>``/``&``/``<<``/``|`` on BIGINT)."""
    k = len(names)
    _check_n(k, bits)
    if k == 2:
        return morton_code_sql(names[0], names[1], bits)
    terms = []
    for i in range(bits):
        for j, x in enumerate(names):
            terms.append(
                f"(((CAST({x} AS BIGINT) >> {i}) & 1) << {i * k + j})"
            )
    return "(" + " | ".join(terms) + ")"


def morton_decode_n(code: Column, k: int, bits: int = 16) -> list[Column]:
    """Invert morton_code_n: the k original values from the interleaved
    code (bit i of column j read back from position i*k + j)."""
    _check_n(k, bits)
    c = code.cast("long")
    out = []
    for j in range(k):
        v = F.lit(0).cast("long")
        for i in range(bits):
            bit = F.shiftright(c, i * k + j).bitwiseAND(F.lit(1))
            v = v.bitwiseOR(F.shiftleft(bit, i))
        out.append(v)
    return out


def zorder_by(df: DataFrame, *cols: str, n_files: int = 8) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the Morton code of
    the given columns (2 or more) into ``n_files`` output partitions,
    sort within each — one shuffle, and every output file covers a
    compact Z-curve segment (tight min/max on EVERY interleaved
    column)."""
    coded = df.withColumn(
        "__z", morton_code_n([F.col(c) for c in cols])
    )
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
    _check_bits(bits)
    return _unspread(code), _unspread(F.shiftright(code.cast("long"), 1))


def string_rank_boundaries(
    df: DataFrame, col: str, bits: int = 8, sample: int = 8192
) -> list[str]:
    """Sampled lexicographic RANGE boundaries for a string column:
    ``2^bits - 1`` (or fewer) sorted strings splitting the observed
    distinct values into ~equal-population rank buckets — the string
    analogue of the numeric approxQuantile sketch (Delta Z-orders
    strings the same way: range-partition ids from sampled bounds).
    The sample is a deterministic hash-ordered top-K over DISTINCT
    values (TakeOrderedAndProject — distributed partial top-K, only
    ``sample`` strings ever reach the driver), so the boundary list is
    stable across runs and partitionings."""
    B = 1 << bits
    vals = [
        r[0]
        for r in df.select(F.col(col).alias("v"))
        .where(F.col(col).isNotNull())
        .distinct()
        .orderBy(F.xxhash64("v"), "v")
        .limit(sample)
        .collect()
    ]
    vals.sort()
    if len(vals) <= 1:
        return []
    step = max(1, len(vals) // B)
    bounds = sorted({vals[i] for i in range(step, len(vals), step)})
    return bounds[: B - 1]


def string_rank_id(
    col: Column, bounds: list[str], bits: int = 8
) -> Column:
    """Rank-bucket id in ``[0, 2^bits)`` for a string column given its
    sampled boundaries: the count of boundaries <= value, evaluated as
    ONE JVM-side higher-order fold over the broadcast boundary-array
    literal (no Python in the hot path; ~|bounds| string compares per
    row — trivial next to the rewrite shuffle this feeds). NULLs land
    in the top bucket, mirroring the numeric path."""
    B = 1 << bits
    if not bounds:
        return F.when(col.isNull(), F.lit(B - 1)).otherwise(F.lit(0))
    rank = F.aggregate(
        F.array(*[F.lit(b) for b in bounds]),
        F.lit(0),
        lambda acc, b: acc + (col >= b).cast("int"),
    )
    return F.when(col.isNull(), F.lit(B - 1)).otherwise(
        F.least(rank, F.lit(B - 1))
    )


def zorder_quantile(
    df: DataFrame,
    cols: list[str],
    n_files: int = 8,
    bits: int = 8,
) -> DataFrame:
    """Z-order clustering for ARBITRARY numeric/date/timestamp/string
    columns: each column is first reduced to a rank-bucket id in
    ``[0, 2^bits)`` — numeric/date/timestamp via one driver-bounded
    ``approxQuantile`` sketch per column, strings via sampled
    lexicographic boundaries (:func:`string_rank_boundaries`, the
    Delta OPTIMIZE ZORDER range-id idea in both cases) — the ids are
    bit-interleaved, and the frame is range-partitioned + sorted on
    the code. Quantile bucketing (not min/max linear scaling) keeps
    the Z-curve balanced under skew: every bucket holds ~1/2^bits of
    the rows, so every output file is a tight hyper-rectangle even
    when one key is power-law distributed. Because string buckets are
    LEXICOGRAPHIC ranges (not hashes), per-file min/max stats on the
    string column stay tight and prune equality AND range predicates.

    NULLs land in the top bucket (documented; layout-only — never a
    correctness concern). Complex types (array/map/struct) are refused
    loudly. One shuffle (plus one bounded top-K sample job per string
    column)."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (sort for one)")
    B = 1 << bits
    types = dict(df.dtypes)
    num = df
    tmp = []           # numeric surrogate columns for approxQuantile
    id_by_col: dict[str, Column] = {}
    for c in cols:
        dt = types.get(c)
        if dt is None:
            raise ValueError(f"no column '{c}' in {sorted(types)}")
        col = F.col(c)
        if dt.startswith(("array", "map", "struct")):
            raise ValueError(
                f"zorder_quantile on '{c}' ({dt}): complex types "
                f"have no rank order"
            )
        if dt == "string":
            bounds = string_rank_boundaries(df, c, bits)
            id_by_col[c] = string_rank_id(col, bounds, bits)
            continue
        if dt == "date":
            col = F.datediff(col, F.lit("1970-01-01").cast("date"))
        num = num.withColumn(f"__zq_{c}", col.cast("double"))
        tmp.append(f"__zq_{c}")
    # one pass, all numeric columns: B-1 quantile boundaries each,
    # sampled to a driver-bounded sketch (Greenwald-Khanna in Spark)
    if tmp:
        qs = num.stat.approxQuantile(
            tmp, [i / B for i in range(1, B)], 1.0 / (4 * B)
        )
        from pyspark.ml.feature import Bucketizer

        splits = [
            [float("-inf")] + sorted(set(q)) + [float("inf")] for q in qs
        ]
        num = Bucketizer(
            inputCols=tmp,
            outputCols=[f"{t}_b" for t in tmp],
            splitsArray=splits,
            handleInvalid="keep",  # null/NaN -> extra bucket, clamped
        ).transform(num)
        for c in cols:
            if f"__zq_{c}" in tmp:
                id_by_col[c] = F.least(
                    F.col(f"__zq_{c}_b").cast("long"), F.lit(B - 1)
                )
    ids = [id_by_col[c] for c in cols]
    coded = num.withColumn("__z", morton_code_n(ids, bits))
    return (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *tmp, *[f"{t}_b" for t in tmp])
    )
