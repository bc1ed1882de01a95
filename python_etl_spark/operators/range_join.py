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
    """
    wus = int(bucket_width_s) * 1_000_000

    def micros(c: str):
        # bucketing needs only a monotonic affine map, so the
        # NTZ->timestamp cast (session-TZ shift) is harmless as long as
        # points and intervals go through the same conversion; the
        # exact predicate below compares the ORIGINAL columns
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = points.withColumn("__b", F.floor(micros(point_ts) / wus))
    iv = intervals.withColumn(
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
