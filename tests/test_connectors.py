"""Source/sink round-trips: parquet (+partitioned), CSV, JSON/JSONL,
XML parse, JDBC gating."""

from __future__ import annotations

import pytest

from python_etl_spark.sinks.writers import write_csv, write_json, write_parquet
from python_etl_spark.sources.readers import (
    read_csv,
    read_json,
    read_jdbc,
    read_parquet,
    read_xml,
)


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", 3.5)],
        "id long, name string, score double",
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "t.parquet")
    write_parquet(sample, path)
    assert _sorted_rows(read_parquet(spark, path)) == _sorted_rows(sample)


def test_parquet_partitioned_layout(spark, sample, tmp_path):
    path = str(tmp_path / "part.parquet")
    write_parquet(sample, path, partition_by=["name"])
    sub = [p.name for p in (tmp_path / "part.parquet").iterdir()]
    assert any(s.startswith("name=") for s in sub)
    back = read_parquet(spark, path)
    assert back.count() == 3
    # partition pruning: filtered scan only touches one directory
    plan = back.where(back.name == "alpha")._jdf.queryExecution().executedPlan().toString()
    assert "alpha" in plan


def test_dynamic_partition_overwrite(spark, tmp_path):
    """partitionOverwriteMode=dynamic must rewrite ONLY the partitions
    present in the incoming batch — the incremental-load contract (a
    static overwrite would wipe every other day's data at 100 TB)."""
    path = str(tmp_path / "dyn.parquet")
    from pyspark.sql import functions as F

    base = spark.range(6).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("day")
    )
    base.write.partitionBy("day").mode("overwrite").parquet(path)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patch = spark.createDataFrame(
            [(100, "1")], "id long, day string"
        )
        patch.write.partitionBy("day").mode("overwrite").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(path)
    # partition values come back type-inferred (int here)
    got = {(r.id, int(r.day)) for r in back.collect()}
    # day=1 replaced by the single patch row; day=0 and day=2 intact
    assert got == {(0, 0), (3, 0), (2, 2), (5, 2), (100, 1)}


def test_csv_roundtrip_with_schema(spark, sample, tmp_path):
    path = str(tmp_path / "t.csv")
    write_csv(sample, path, delimiter="|")
    back = read_csv(
        spark, path, schema="id long, name string, score double", delimiter="|"
    )
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_json_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "t.json")
    write_json(sample, path)
    back = read_json(spark, path, schema="id long, name string, score double")
    assert _sorted_rows(back.select("id", "name", "score")) == _sorted_rows(sample)


def test_xml_reader(spark, tmp_path):
    xml = """<inventory>
      <item><name>bolt</name><qty>7</qty><price>0.25</price></item>
      <item><name>nut</name><qty>12</qty><price>0.1</price></item>
      <item><name>washer</name><qty></qty><price>0.05</price></item>
    </inventory>"""
    f = tmp_path / "inv.xml"
    f.write_text(xml)
    df = read_xml(
        spark, str(f), row_tag="item", schema="name string, qty int, price double"
    )
    rows = _sorted_rows(df)
    assert rows == [
        ("bolt", 7, 0.25),
        ("nut", 12, 0.1),
        ("washer", None, 0.05),
    ]


def test_jdbc_gated_error(spark):
    with pytest.raises(RuntimeError, match="JDBC"):
        read_jdbc(spark, "jdbc:postgresql://nowhere/db", "sometable")


def test_orc_roundtrip(spark, sample, tmp_path):
    from python_etl_spark.sinks.writers import write_orc
    from python_etl_spark.sources.readers import read_orc

    path = str(tmp_path / "t.orc")
    write_orc(sample, path)
    assert _sorted_rows(read_orc(spark, path)) == _sorted_rows(sample)


def test_text_and_binary_sources(spark, tmp_path):
    from python_etl_spark.sources.readers import read_binary_files, read_text

    (tmp_path / "a.txt").write_text("hello\nworld")
    (tmp_path / "b.bin").write_bytes(b"\x00\x01\x02payload")
    lines = read_text(spark, str(tmp_path / "a.txt"))
    assert sorted(r.value for r in lines.collect()) == ["hello", "world"]
    whole = read_text(spark, str(tmp_path / "a.txt"), wholetext=True)
    assert whole.first().value == "hello\nworld"
    bins = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = bins.collect()
    assert len(rows) == 1
    assert bytes(rows[0].content) == b"\x00\x01\x02payload"
    assert rows[0].length == 10


def test_csv_gzip_roundtrip(spark, sample, tmp_path):
    path = str(tmp_path / "t.csv.gz")
    sample.write.mode("overwrite").option("header", True).option(
        "compression", "gzip"
    ).csv(path)
    import glob
    assert glob.glob(f"{path}/*.gz")
    back = read_csv(spark, path, schema="id long, name string, score double")
    assert _sorted_rows(back) == _sorted_rows(sample)


def test_excel_gated(spark, tmp_path):
    from python_etl_spark.sources.readers import read_excel

    f = tmp_path / "x.xlsx"
    f.write_bytes(b"not really an xlsx")
    with pytest.raises(Exception) as ei:
        read_excel(spark, str(f))
    # either the gate (no engine) or a parse error — never a silent pass
    assert ei.value is not None


def test_jdbc_write_gated(spark, sample):
    from python_etl_spark.sinks.writers import write_jdbc

    with pytest.raises(RuntimeError, match="JDBC"):
        write_jdbc(sample, "jdbc:postgresql://nowhere/db", "t")


def test_csv_malformed_row_handling(spark, tmp_path):
    """PERMISSIVE captures bad rows in _corrupt_record; DROPMALFORMED
    silently drops them — both standard untrusted-feed modes."""
    f = tmp_path / "messy.csv"
    f.write_text("id,qty\n1,10\nnot_a_number,xx\n3,30\n")
    schema = "id long, qty long, _corrupt_record string"
    permissive = (
        spark.read.schema(schema).option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(f))
    ).cache()
    rows = permissive.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and "not_a_number" in bad[0]._corrupt_record
    dropped = (
        spark.read.schema("id long, qty long").option("header", True)
        .option("mode", "DROPMALFORMED").csv(str(f))
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 3]
    permissive.unpersist()


def test_python_udtf(spark):
    """Spark 4 Python UDTF: one row in -> many typed rows out."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, pos: int")
    class Splitter:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield w, i

    got = Splitter(lit("alpha beta gamma")).collect()
    assert [(r.word, r.pos) for r in got] == [
        ("alpha", 0), ("beta", 1), ("gamma", 2)
    ]


def test_fixed_width_reader(spark, tmp_path):
    from python_etl_spark.sources.readers import read_fixed_width

    p = tmp_path / "ledger.txt"
    p.write_text(
        "00001alpha     0001.50\n"
        "00002beta      0002.25\n"
        "00003gamma     -003.75\n"
    )
    df = read_fixed_width(
        spark,
        str(p),
        [
            ("id", 1, 5, "long"),
            ("name", 6, 10, "string"),
            ("amount", 16, 7, "double"),
        ],
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [
        (1, "alpha", 1.5),
        (2, "beta", 2.25),
        (3, "gamma", -3.75),
    ]


def test_parquet_codec_round_trips(spark, sf_dir, tmp_path):
    """zstd / snappy / gzip parquet codecs all round-trip identical
    data — zstd is the default worth pinning for a 100 TB lake (best
    ratio at comparable scan speed)."""
    from python_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    truth = docs.count()
    for codec in ("zstd", "snappy", "gzip"):
        path = str(tmp_path / f"docs_{codec}")
        docs.write.option("compression", codec).parquet(path)
        back = spark.read.parquet(path)
        assert back.count() == truth, codec
        assert set(back.columns) == set(docs.columns), codec
    # identical logical content across codecs (hash of sorted rows)
    from pyspark.sql import functions as SF

    def content_hash(path):
        df = spark.read.parquet(path)
        return (
            df.select(SF.md5(SF.to_json(SF.struct(*sorted(df.columns)))).alias("h"))
            .agg(SF.sum(SF.conv(SF.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")))
            .first()[0]
        )
    hashes = {c: content_hash(str(tmp_path / f"docs_{c}")) for c in ("zstd", "snappy", "gzip")}
    assert len(set(hashes.values())) == 1, hashes


def test_parquet_bloom_filter_written_and_round_trips(spark, tmp_path):
    """write_parquet(bloom_filter_cols=...) must actually emit parquet
    bloom filters (observable as a deterministic file-size increase —
    ~a megabit for 100k NDV — pyarrow's metadata API doesn't surface
    the offsets) and the data must round-trip unchanged. Blooms are
    the row-group skipping tool for equality lookups on hash-like
    keys, where min/max zones never prune."""
    import os

    from python_etl_spark.sinks.writers import write_parquet

    df = spark.range(50000).selectExpr(
        "id", "md5(cast(id as string)) as k"
    ).coalesce(1)
    plain = str(tmp_path / "plain")
    bloomy = str(tmp_path / "bloomy")
    write_parquet(df, plain)
    write_parquet(df, bloomy, bloom_filter_cols={"k": 50000})

    def fsize(d):
        return sum(
            os.path.getsize(os.path.join(d, n))
            for n in os.listdir(d)
            if n.endswith(".parquet")
        )

    assert fsize(bloomy) > fsize(plain) + 30000  # the bloom bitmaps
    back = spark.read.parquet(bloomy)
    assert back.count() == 50000
    assert back.where("id = 4242").count() == 1
