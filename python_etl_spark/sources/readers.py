"""File-format readers (the engine's *extract* connectors).

CSV/JSON/Parquet delegate to Spark's native sources (distributed,
predicate-pushdown-capable). XML has no built-in Spark source, so
``read_xml`` parses whole files inside ``mapInPandas`` — one Arrow
batch per file, stdlib ElementTree, no external deps. JDBC is gated:
the API is stable but raises a clear error until a driver jar is on
the classpath.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    header: bool = True,
    delimiter: str = ",",
    **options,
) -> DataFrame:
    reader = spark.read.option("header", header).option("delimiter", delimiter)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    multiline: bool = False,
    **options,
) -> DataFrame:
    reader = spark.read.option("multiLine", multiline)
    if schema:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: str,
) -> DataFrame:
    """Parse XML files into rows of ``row_tag`` elements.

    ``schema`` is a DDL string naming child elements to extract, e.g.
    ``"name string, qty int, price double"``. Parsing runs distributed
    (one task per file via wholetext + mapInPandas); values are
    extracted as text then cast to the declared types.
    """
    import pandas as pd

    from pyspark.sql.types import StructType

    struct: StructType = StructType.fromDDL(schema)
    field_names = [f.name for f in struct.fields]
    text_schema = ", ".join(f"{n} string" for n in field_names)

    files = spark.read.text(path, wholetext=True)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import xml.etree.ElementTree as ET

        for batch in batches:
            rows = []
            for content in batch["value"]:
                root = ET.fromstring(content)
                it = (
                    [root]
                    if root.tag == row_tag
                    else root.iter(row_tag)
                )
                for elem in it:
                    vals = {n: elem.findtext(n) for n in field_names}
                    # empty elements -> NULL (ANSI casts reject '')
                    rows.append(
                        {n: (v if v not in (None, "") else None)
                         for n, v in vals.items()}
                    )
            yield pd.DataFrame(rows, columns=field_names)

    parsed = files.mapInPandas(_parse, schema=text_schema)
    return parsed.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in struct.fields]
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    **properties,
) -> DataFrame:
    """JDBC extract with optional partitioned parallel reads.

    Gated: raises a descriptive error when no JDBC driver is available
    in this environment (none are baked into the container)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions or 8)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            "JDBC read failed — no JDBC driver jar is bundled in this "
            "environment. Add the driver to spark.jars and retry. "
            f"Underlying error: {e}"
        ) from e


def read_orc(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def read_text(
    spark: SparkSession, path: str, wholetext: bool = False
) -> DataFrame:
    return spark.read.text(path, wholetext=wholetext)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Binary-file source for multimodal payload ingestion: one row per
    file with (path, modificationTime, length, content binary)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: str | int = 0,
    header: bool = True,
) -> DataFrame:
    """Excel extract (the classic small-file ETL source): parsed on the
    driver via pandas/openpyxl — Excel files are driver-sized by
    nature — then parallelized as a DataFrame.

    Gated: raises a descriptive error when no Excel engine (openpyxl /
    xlrd) is installed in this environment."""
    import pandas as pd

    try:
        pdf = pd.read_excel(
            path, sheet_name=sheet_name, header=0 if header else None
        )
    except ImportError as e:
        raise RuntimeError(
            "Excel read requires an engine (openpyxl for .xlsx); none is "
            f"installed in this environment. Underlying error: {e}"
        ) from e
    return spark.createDataFrame(pdf)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Fixed-width (mainframe/ledger-style) text source: ``colspecs`` is
    ``(name, start, length, type)`` with 1-based starts. Implemented as
    a distributed text scan + substring/trim/cast projection — a single
    narrow WholeStageCodegen stage, no Python in the row path."""
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    cols = [
        F.trim(F.substring("value", start, length)).cast(dtype).alias(name)
        for name, start, length, dtype in colspecs
    ]
    return raw.select(*cols)
