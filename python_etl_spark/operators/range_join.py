"""Range (interval containment) join without a theta-join.

A naive ``points JOIN intervals ON p.ts >= start AND p.ts < end`` has
no equi-key, so Spark plans a BroadcastNestedLoopJoin / cartesian —
O(|points| x |intervals|) comparisons, dead at scale. The standard
fix: quantize time into fixed-width buckets, explode each interval
into the buckets it covers (~len/width + 1 rows), map each point to
its single bucket, EQUI-join on the bucket id, then apply the exact
range predicate. Shuffle cost is linear in rows; the replication
factor is bounded by interval_length / bucket_width + 1, so pick the
bucket width near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_s: int = 1800,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start <= point < end`` (end-exclusive). Column sets must be
    disjoint apart from none — both frames' columns are carried through.

    Empty intervals (``end <= start``) contain no points under the
    half-open predicate, so they are dropped before the explode — this
    also keeps ``F.sequence`` from generating a DESCENDING bucket list
    (Spark defaults the step to -1) for a ``[t, t)`` interval landing
    on a bucket boundary.
    """
    wus = int(bucket_width_s) * 1_000_000

    def micros(c: str):
        # bucketing needs only a monotonic affine map, so the
        # NTZ->timestamp cast (session-TZ shift) is harmless as long as
        # points and intervals go through the same conversion; the
        # exact predicate below compares the ORIGINAL columns
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = points.withColumn("__b", F.floor(micros(point_ts) / wus))
    iv = intervals.where(F.col(end_ts) > F.col(start_ts)).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(micros(start_ts) / wus),
                # end-exclusive: the bucket of (end - 1 microsecond)
                F.floor((micros(end_ts) - F.lit(1)) / wus),
            )
        ),
    )
    return (
        p.join(iv, "__b")
        .where(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("__b")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_width_s: int = 1800,
) -> DataFrame:
    """Inner-join two INTERVAL sets on true overlap
    (``a_start < b_end AND b_start < a_end``, half-open) without a
    cartesian product: both sides explode onto a coarse time grid and
    equijoin on (keys, bucket). A pair that shares several buckets
    would duplicate, so each pair is emitted ONLY from the bucket
    containing ``max(a_start, b_start)`` — no DISTINCT shuffle needed.
    Cost scales with true overlap density per grid cell, never |a|x|b|.

    Empty intervals (``end <= start``) overlap nothing — the half-open
    predicate alone would misclassify an empty interval strictly inside
    another as overlapping, so both sides drop them before exploding
    (which also avoids descending ``F.sequence`` bucket lists for
    boundary-aligned ``[t, t)`` inputs).
    """
    wus = int(bucket_width_s) * 1_000_000

    def micros(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    a = a.where(F.col(a_end) > F.col(a_start))
    b = b.where(F.col(b_end) > F.col(b_start))
    ae = a.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(micros(a_start) / wus),
                F.floor((micros(a_end) - F.lit(1)) / wus),
            )
        ),
    )
    be = b.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(micros(b_start) / wus),
                F.floor((micros(b_end) - F.lit(1)) / wus),
            )
        ),
    )
    first_shared = F.floor(
        F.greatest(
            F.unix_micros(F.col(a_start).cast("timestamp")),
            F.unix_micros(F.col(b_start).cast("timestamp")),
        )
        / wus
    )
    return (
        ae.join(be, [*keys, "__b"])
        .where(
            (F.col(a_start) < F.col(b_end))
            & (F.col(b_start) < F.col(a_end))
            & (F.col("__b") == first_shared)
        )
        .drop("__b")
    )
