"""Bloom-filter semi-join: the runtime-filter pattern, made explicit.

At cluster scale the cost of `fact ⋉ keys` is shuffling the fact table;
when the key set is selective, almost all shuffled fact rows are
discarded on the other side. A Bloom filter built from the key side and
applied AS A MAP-SIDE PREDICATE removes those rows before the exchange:
shuffle volume drops to (selectivity + false-positive rate) of the
fact. Spark's own runtime row-group filtering does this opportunistically;
this operator is the deterministic, always-on form — and because the
survivors still pass through an EXACT semi join, false positives cannot
leak into the result, so correctness is that of a plain semi join.

Driver-side state is the bitmap only: ``n_bits/64`` longs (default
64 Kbit = 1 KB), collected from a ≤1024-row aggregate and re-broadcast
as a plan literal — O(bitmap), never O(keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEFAULT_BITS = 1 << 16
_SEED2 = 0x5BD1


def _positions(key: Column, n_bits: int) -> list[Column]:
    """Two independent 64-bit hash probes folded into bit positions —
    xxhash64 with distinct seeds, the family Spark's own
    BloomFilterAggregate uses."""
    return [
        F.pmod(F.xxhash64(key), F.lit(n_bits)).cast("int"),
        F.pmod(F.xxhash64(key, F.lit(_SEED2)), F.lit(n_bits)).cast("int"),
    ]


def build_bloom(
    keys: DataFrame, key_col: str, n_bits: int = _DEFAULT_BITS
) -> list[int]:
    """Aggregate the key side into a bitmap: explode each key's probe
    positions, OR per 64-bit word (≤ n_bits/64 grouped rows — the only
    thing the driver ever holds)."""
    if n_bits <= 0 or n_bits % 64 != 0:
        raise ValueError(
            f"n_bits must be a positive multiple of 64 (the bitmap is "
            f"stored as 64-bit words; a ragged tail would index past "
            f"the last word); got {n_bits}"
        )
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits))).alias(
        "pos"
    )
    words = (
        # null keys can never match a semi join and would produce null
        # probe positions — drop them before hashing
        keys.where(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            # SQL shiftleft accepts a column shift amount (the PySpark
            # wrapper insists on an int literal)
            F.expr("shiftleft(1L, pos % 64)").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    bitmap = [0] * (n_bits // 64)
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_prefilter(
    df: DataFrame, key_col: str, bitmap: list[int]
) -> DataFrame:
    """Keep rows whose key MIGHT be in the bloom (both probe bits set).
    The bitmap rides in the plan as an array literal; the membership
    test is whole-stage-codegen bit arithmetic — no join, no shuffle,
    no broadcast variable."""
    n_bits = len(bitmap) * 64
    # one SQL parse for the 1024-word bitmap literal — the per-word
    # F.lit().cast() py4j round trips dominated construction time;
    # the parsed array<bigint> literal is value-identical
    arr = F.expr("array(" + ",".join(f"{int(w)}L" for w in bitmap) + ")")
    p1, p2 = _positions(F.col(key_col), n_bits)
    tmp = df.withColumn("__bw", arr).withColumn("__p1", p1).withColumn(
        "__p2", p2
    )
    hit = F.expr(
        "(element_at(__bw, cast(__p1 / 64 as int) + 1)"
        " & shiftleft(1L, __p1 % 64)) != 0"
        " AND (element_at(__bw, cast(__p2 / 64 as int) + 1)"
        " & shiftleft(1L, __p2 % 64)) != 0"
    )
    return tmp.where(hit).drop("__bw", "__p1", "__p2")


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str | None = None,
    n_bits: int = _DEFAULT_BITS,
) -> DataFrame:
    """`fact ⋉ keys` with a Bloom pre-filter: map-side bitmap predicate
    first (kills ~all non-matching rows before any shuffle), exact
    left-semi join second (kills the false positives). Result is
    row-identical to `fact.join(keys, on, "left_semi")`.

    xxhash64 is type-sensitive where SQL equality coerces: a bigint 5
    and a string '5' are join-equal but hash differently, and a
    mismatched build/probe type would silently DROP true matches
    before the exact join could restore them. The key side is
    therefore cast to the fact key's type before hashing (and before
    the verifying join, so both phases see the same values)."""
    keys_key = keys_key or fact_key
    fact_type = fact.schema[fact_key].dataType
    k = keys.select(F.col(keys_key).cast(fact_type).alias(fact_key))
    bitmap = build_bloom(k, fact_key, n_bits)
    pre = bloom_prefilter(fact, fact_key, bitmap)
    return pre.join(k.distinct(), fact_key, "left_semi")
