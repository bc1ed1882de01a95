"""Gap-based sessionization (batch form).

Classic two-window formulation — one shuffle on the user key:
flag rows whose gap from the previous event exceeds the threshold,
running-sum the flags into a session index, then aggregate sessions.
The streaming twin (arbitrary stateful processing) lives in
python_etl_spark.streaming.sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_etl_spark.functions.exact import dsum


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    tiebreak_col: str | None = None,
    value_col: str | None = None,
) -> DataFrame:
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lag_ts = F.lag(ts_col).over(w)
    gap = F.col(ts_col) - lag_ts
    new_session = F.when(
        lag_ts.isNull() | (gap > F.expr(f"INTERVAL {gap_minutes} MINUTE")), 1
    ).otherwise(0)

    numbered = events.withColumn("__new", new_session).withColumn(
        "session_idx", F.sum("__new").over(w_run)
    )
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col:
        aggs.append(dsum(value_col).alias("total_value"))
    return numbered.groupBy(user_col, "session_idx").agg(*aggs)
