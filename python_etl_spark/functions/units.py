"""Unit-conversion column expressions — the classic Python-ETL
transform surface (imperial↔metric, temperatures, durations), kept as
pure JVM arithmetic so conversions run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# length
def inches_to_cm(col: str | Column) -> Column:
    return _c(col) * 2.54


def miles_to_km(col: str | Column) -> Column:
    return _c(col) * 1.609344


# mass
def lbs_to_kg(col: str | Column) -> Column:
    return _c(col) * 0.45359237


def kg_to_lbs(col: str | Column) -> Column:
    return _c(col) / 0.45359237


# temperature
def fahrenheit_to_celsius(col: str | Column) -> Column:
    return (_c(col) - 32.0) * 5.0 / 9.0


def celsius_to_fahrenheit(col: str | Column) -> Column:
    return _c(col) * 9.0 / 5.0 + 32.0


# durations
def seconds_to_hours(col: str | Column) -> Column:
    return _c(col) / 3600.0


CONVERTERS = {
    "inches_to_cm": inches_to_cm,
    "miles_to_km": miles_to_km,
    "lbs_to_kg": lbs_to_kg,
    "kg_to_lbs": kg_to_lbs,
    "fahrenheit_to_celsius": fahrenheit_to_celsius,
    "celsius_to_fahrenheit": celsius_to_fahrenheit,
    "seconds_to_hours": seconds_to_hours,
}


def convert(col: str | Column, conversion: str) -> Column:
    try:
        return CONVERTERS[conversion](col)
    except KeyError:
        raise ValueError(
            f"unknown conversion {conversion!r}; have {sorted(CONVERTERS)}"
        ) from None
