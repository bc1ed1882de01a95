"""Pipeline observability: zero-cost inline metrics via Observation.

``df.observe`` attaches aggregate metrics to a plan that are computed
DURING the action that materializes it — no second scan, no extra job.
That is the right way to monitor a 100 TB pipeline write ("how many
rows / how many nulls / what value total actually flowed into the
sink?"): a separate ``df.count()`` would re-run the whole upstream
plan. The metrics ride the existing tasks and surface on the driver
after the action completes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_metrics(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach aggregate ``metrics`` to the frame; returns (frame,
    observation). Read ``observation.get`` AFTER an action ran."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def row_health_metrics(*cols: str) -> list[Column]:
    """Standard write-side health metrics: total rows plus a null
    count per listed column (the inputs every data-quality SLO
    needs, computed for free inside the write)."""
    out = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        out.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"n_null_{c}"
            )
        )
    return out
