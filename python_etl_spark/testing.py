"""Oracle-parity harness: replicates the driver's correctness gate.

Runs each registered Spark plan and its DuckDB oracle on the same
parquet directory, then compares row count, column-name set, and
order-insensitive values. Floats are compared by exact repr — stricter
than any rounding hash the driver might use, so passing here implies
passing the gate.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from python_etl_spark.sources.tables import TABLE_NAMES

NULL_TOKEN = "␀NULL"


def _cell(v) -> str:
    if v is None:
        return NULL_TOKEN
    if isinstance(v, float):
        if math.isnan(v):
            return NULL_TOKEN
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return NULL_TOKEN if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return json.dumps([_cell(x) for x in list(v)])
    if v is pd.NaT:
        return NULL_TOKEN
    try:
        if pd.isna(v):
            return NULL_TOKEN
    except (TypeError, ValueError):
        pass
    return str(v)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    out = out.apply(lambda col: col.map(_cell))
    if len(out.columns):
        out = out.sort_values(by=list(out.columns), kind="mergesort")
    return out.reset_index(drop=True)


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1
    diffs: list[str] = field(default_factory=list)


def compare_frames(
    name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> ParityResult:
    r = ParityResult(name, True, spark_rows=len(spark_pdf), oracle_rows=len(oracle_pdf))
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        r.ok = False
        r.detail = f"columns differ: spark={s_cols} oracle={o_cols}"
        return r
    if len(spark_pdf) != len(oracle_pdf):
        r.ok = False
        r.detail = f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        return r
    s = canonicalize(spark_pdf)
    o = canonicalize(oracle_pdf)
    neq = (s != o).any(axis=1)
    if neq.any():
        r.ok = False
        idx = list(neq[neq].index[:5])
        for i in idx:
            r.diffs.append(f"row {i}:\n  spark : {s.iloc[i].to_dict()}\n  oracle: {o.iloc[i].to_dict()}")
        r.detail = f"{int(neq.sum())}/{len(s)} rows differ"
    return r


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_parity(
    spark,
    sf_dir: str,
    only: list[str] | None = None,
    skip: list[str] | None = None,
) -> list[ParityResult]:
    from python_etl_spark.plans import ORACLES, QUERIES

    con = duckdb_connection(sf_dir)
    results: list[ParityResult] = []
    names = [n for n in QUERIES if n in ORACLES]
    if only:
        names = [n for n in names if n in only]
    if skip:
        names = [n for n in names if n not in skip]
    for name in names:
        try:
            spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
            oracle_pdf = con.execute(ORACLES[name]).df()
            r = compare_frames(name, spark_pdf, oracle_pdf)
            if r.ok and len(spark_pdf) == 0:
                # still ok (values match), but surface it: an empty
                # match proves nothing about the query's arithmetic
                r.detail = "WARNING: 0 rows both sides (vacuous hash)"
            results.append(r)
        except Exception as e:  # noqa: BLE001 — report, keep going
            results.append(
                ParityResult(name, False, detail=f"{type(e).__name__}: {e}")
            )
    con.close()
    return results
