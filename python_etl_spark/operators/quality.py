"""Data-quality validation: rule-based split into valid / quarantine.

The ETL pattern for untrusted feeds at scale: evaluate all rules in a
single pass (one boolean column per rule, no Python), route failing
rows to a quarantine frame carrying the names of the rules they broke,
and keep the clean frame for downstream loads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """rules: {rule_name: boolean Column that is True for GOOD rows}.

    Returns (valid, quarantined); quarantined rows gain a
    ``failed_rules`` array column naming every rule they violate."""
    checked = df.withColumn(
        "failed_rules",
        F.filter(
            F.array(
                *[
                    F.when(~cond, F.lit(name)).otherwise(F.lit(None))
                    for name, cond in rules.items()
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    valid = checked.where(F.size("failed_rules") == 0).drop("failed_rules")
    quarantined = checked.where(F.size("failed_rules") > 0)
    return valid, quarantined


def violation_counts(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Per-rule violation counts in one aggregation pass."""
    return df.agg(
        *[
            F.sum(F.when(~cond, 1).otherwise(0)).alias(name)
            for name, cond in rules.items()
        ]
    )
