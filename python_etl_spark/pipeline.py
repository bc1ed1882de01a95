"""Declarative extract -> transform -> load pipeline API.

Mirrors the ETL-job shape of the Python-ETL reference (named sources,
a transform graph, named sinks) but compiles to lazy DataFrame plans:
nothing executes until ``run()``, so Catalyst optimizes the whole
pipeline end-to-end (pushdown through transforms into the extract).

    Pipeline(spark)
      .extract("orders", "parquet", f"{sf}/orders.parquet")
      .extract("customer", "parquet", f"{sf}/customer.parquet")
      .transform("joined", lambda t: t["orders"].join(
          t["customer"],
          t["orders"].o_custkey == t["customer"].c_custkey))
      .transform_sql("big", "SELECT * FROM joined WHERE o_totalprice > 100")
      .load("big", "parquet", "/tmp/out", partition_by=["o_orderstatus"])
      .run()
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from python_etl_spark.sinks.writers import (
    write_csv,
    write_json,
    write_orc,
    write_parquet,
)
from python_etl_spark.sources.avro import read_avro, write_avro
from python_etl_spark.sources.readers import (
    read_csv,
    read_fixed_width,
    read_json,
    read_orc,
    read_parquet,
    read_xml,
)

_READERS = {
    "parquet": read_parquet,
    "csv": read_csv,
    "json": read_json,
    "xml": read_xml,
    "orc": read_orc,
    "avro": read_avro,
    "fixed_width": read_fixed_width,
}
_WRITERS = {
    "parquet": write_parquet,
    "csv": write_csv,
    "json": write_json,
    "orc": write_orc,
    "avro": write_avro,
}


@dataclass
class _Load:
    name: str
    fmt: str
    path: str
    options: dict = field(default_factory=dict)


class Pipeline:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.frames: dict[str, DataFrame] = {}
        self._loads: list[_Load] = []
        self._inc_loads: list[
            tuple[str, str, str, list[str] | None, list[str] | None]
        ] = []
        #: per-frame result dicts of the last run()'s incremental loads
        self.incremental_results: dict[str, dict] = {}

    def extract(self, name: str, fmt: str, path: str, **options) -> "Pipeline":
        if fmt not in _READERS:
            raise ValueError(f"unknown source format {fmt!r}; have {sorted(_READERS)}")
        self.frames[name] = _READERS[fmt](self.spark, path, **options)
        return self

    def extract_df(self, name: str, df: DataFrame) -> "Pipeline":
        self.frames[name] = df
        return self

    def transform(
        self, name: str, fn: Callable[[dict[str, DataFrame]], DataFrame]
    ) -> "Pipeline":
        self.frames[name] = fn(self.frames)
        return self

    def transform_sql(self, name: str, query: str) -> "Pipeline":
        for fname, df in self.frames.items():
            df.createOrReplaceTempView(fname)
        self.frames[name] = self.spark.sql(query)
        return self

    def load(self, name: str, fmt: str, path: str, **options) -> "Pipeline":
        if fmt not in _WRITERS:
            raise ValueError(f"unknown sink format {fmt!r}; have {sorted(_WRITERS)}")
        if name not in self.frames:
            raise KeyError(f"no frame named {name!r}; have {sorted(self.frames)}")
        self._loads.append(_Load(name, fmt, path, options))
        return self

    def load_incremental(
        self,
        name: str,
        root: str,
        watermark_col: str,
        keys: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> "Pipeline":
        """High-watermark incremental load into a versioned table at
        ``root``: each run() extracts only rows with ``watermark_col``
        past the bookmark committed by the previous run (the bookmark
        rides in the table manifest — see incremental.incremental_load
        for the crash-safety contract). ``keys`` upgrades append to
        MERGE; ``partition_by`` hive-partitions the table (sticky from
        the first run)."""
        if name not in self.frames:
            raise KeyError(f"no frame named {name!r}; have {sorted(self.frames)}")
        self._inc_loads.append((name, root, watermark_col, keys, partition_by))
        return self

    def run(self) -> dict[str, str]:
        """Execute all loads; returns {frame_name: output_path}."""
        from python_etl_spark.incremental import incremental_load
        from python_etl_spark.sinks.table import VersionedTable

        out = {}
        for load in self._loads:
            out[load.name] = _WRITERS[load.fmt](
                self.frames[load.name], load.path, **load.options
            )
        for name, root, wm_col, keys, part_by in self._inc_loads:
            self.incremental_results[name] = incremental_load(
                self.frames[name], VersionedTable(root), wm_col, keys, part_by
            )
            out[name] = root
        return out

    @classmethod
    def from_spec(cls, spark: SparkSession, spec: dict) -> "Pipeline":
        """Config-file style: {"extract": [...], "transform_sql": [...],
        "load": [...]} — the reference's job-spec shape."""
        p = cls(spark)
        for src in spec.get("extract", []):
            src = dict(src)
            p.extract(src.pop("name"), src.pop("format"), src.pop("path"), **src)
        for t in spec.get("transform_sql", []):
            p.transform_sql(t["name"], t["query"])
        for sink in spec.get("load", []):
            sink = dict(sink)
            p.load(sink.pop("name"), sink.pop("format"), sink.pop("path"), **sink)
        return p
