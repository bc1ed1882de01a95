"""WARC connector: record codec, gzip member framing, distributed
round-trip, truncation/corruption behavior, non-response records."""

from __future__ import annotations

import gzip
import io

import pytest

from python_etl_spark.sources.warc import (
    WarcFormatError,
    build_http_response_record,
    build_record,
    parse_warc,
    parse_warc_bytes,
    read_warc,
    write_warc,
)


def _gz(b: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(b)
    return buf.getvalue()


def test_record_codec_round_trip_plain():
    rec = build_http_response_record(
        "https://example.com/a", b"<html>hi</html>"
    )
    rows = list(parse_warc(rec))
    assert len(rows) == 1
    r = rows[0]
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "https://example.com/a"
    assert r["http_status"] == 200
    assert r["http_content_type"].startswith("text/html")
    assert r["payload"] == b"<html>hi</html>"
    assert not r["is_truncated"]


def test_record_ids_deterministic():
    a = build_http_response_record("https://e.com/x", b"b1")
    b = build_http_response_record("https://e.com/x", b"b2")
    ida = list(parse_warc(a))[0]["record_id"]
    idb = list(parse_warc(b))[0]["record_id"]
    assert ida == idb and ida.startswith("<urn:uuid:")
    c = build_http_response_record("https://e.com/OTHER", b"b1")
    assert list(parse_warc(c))[0]["record_id"] != ida


def test_multi_record_gzip_members_and_non_response_records():
    """warcinfo + request + response in one .warc.gz (one gzip member
    per record, the Common Crawl framing): all three surface, only the
    response gets HTTP parsing."""
    info = build_record(
        "warcinfo", b"software: x\r\n", content_type="application/warc-fields"
    )
    req = build_record(
        "request",
        b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
        target_uri="https://example.com/a",
        content_type="application/http;msgtype=request",
    )
    resp = build_http_response_record("https://example.com/a", b"BODY")
    data = _gz(info) + _gz(req) + _gz(resp)
    rows = list(parse_warc_bytes(data))
    assert [r["warc_type"] for r in rows] == ["warcinfo", "request", "response"]
    assert rows[0]["http_status"] is None
    assert rows[1]["payload"].startswith(b"GET /a")
    assert rows[2]["http_status"] == 200 and rows[2]["payload"] == b"BODY"


def test_truncated_payload_flagged_not_fatal():
    rec = build_http_response_record("https://e.com/a", b"X" * 100)
    cut = rec[: len(rec) - 60]  # cut inside the payload
    rows = list(parse_warc(cut))
    assert len(rows) == 1 and rows[0]["is_truncated"]
    with pytest.raises(WarcFormatError, match="truncated payload"):
        list(parse_warc(cut, strict=True))


def test_corrupt_gzip_tail_ends_walk_not_task():
    ok = _gz(build_http_response_record("https://e.com/a", b"GOOD"))
    data = ok + b"\x1f\x8b\x08\x00garbage-not-a-member"
    rows = list(parse_warc_bytes(data))
    assert len(rows) == 1 and rows[0]["payload"] == b"GOOD"
    with pytest.raises(WarcFormatError):
        list(parse_warc_bytes(data, strict=True))


def test_distributed_round_trip(spark, tmp_path):
    """write_warc (one .warc.gz per partition) -> read_warc (one task
    per file): every body survives byte-exact, warcinfo records ride
    along, partition count == file count."""
    import os

    rows = [
        (f"https://example.com/doc/{i}", f"<html>doc {i} é</html>")
        for i in range(37)
    ]
    df = spark.createDataFrame(
        rows, "target_uri string, body string"
    ).repartition(4)
    out = str(tmp_path / "warc")
    write_warc(df, out)
    files = [n for n in os.listdir(out) if n.endswith(".warc.gz")]
    assert len(files) == 4

    back = read_warc(spark, out)
    resp = back.where("warc_type = 'response'")
    got = {
        r["target_uri"]: bytes(r["payload"]).decode("utf-8")
        for r in resp.collect()
    }
    assert got == dict(rows)
    assert back.where("warc_type = 'warcinfo'").count() == 4
    assert resp.where("http_status = 200").count() == 37
    assert resp.where("is_truncated").count() == 0


def test_read_warc_plain_uncompressed_file(spark, tmp_path):
    p = tmp_path / "w"
    p.mkdir()
    data = build_http_response_record(
        "https://e.com/1", b"A"
    ) + build_http_response_record("https://e.com/2", b"B")
    (p / "f.warc").write_bytes(data)
    got = read_warc(spark, str(p)).where("warc_type='response'").collect()
    assert sorted(bytes(r["payload"]) for r in got) == [b"A", b"B"]


def test_warc_python_datasource_format(spark, tmp_path):
    """spark.read.format('warc') via the Spark 4 Python DataSource:
    one partition per container, same rows as the binaryFile reader."""
    import os

    from python_etl_spark.sources.warc import (
        read_warc,
        register_warc_source,
        write_warc,
    )

    rows = [(f"https://e.com/d/{i}", f"<html>{i}</html>") for i in range(20)]
    df = spark.createDataFrame(
        rows, "target_uri string, body string"
    ).repartition(3)
    out = str(tmp_path / "w")
    write_warc(df, out)

    assert register_warc_source(spark)
    got = spark.read.format("warc").load(out)
    assert got.rdd.getNumPartitions() == 3  # one per container file
    resp = got.where("warc_type = 'response'")
    want = read_warc(spark, out).where("warc_type = 'response'")
    a = {(r["target_uri"], bytes(r["payload"])) for r in resp.collect()}
    b = {(r["target_uri"], bytes(r["payload"])) for r in want.collect()}
    assert a == b and len(a) == 20
    # strict mode surfaces corruption as an error
    bad = os.path.join(out, "zz-corrupt.warc.gz")
    with open(bad, "wb") as fh:
        fh.write(b"\x1f\x8b\x08\x00garbage")
    flagged = spark.read.format("warc").load(out)
    assert flagged.count() == 23  # corrupt member walk ends quietly
    import pytest as _pytest

    with _pytest.raises(Exception):
        spark.read.format("warc").option("strict", "true").load(out).count()


def test_warc_streaming_source_picks_up_new_containers(spark, tmp_path):
    """readStream.format('warc'): batch 1 sees the initial containers,
    a container arriving later is picked up by the next availableNow
    run from the same checkpoint — streaming crawl ingestion."""
    from pyspark.sql import functions as F

    from python_etl_spark.sources.warc import (
        register_warc_source,
        write_warc,
    )

    src = str(tmp_path / "arriving")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    register_warc_source(spark)

    def run():
        q = (
            spark.readStream.format("warc")
            .load(src)
            .where("warc_type = 'response'")
            .select("target_uri", F.length("payload").alias("n"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    df1 = spark.createDataFrame(
        [(f"https://e.com/a/{i}", f"<p>{i}</p>") for i in range(5)],
        "target_uri string, body string",
    ).coalesce(1)
    write_warc(df1, src)
    # write_warc(overwrite) names files part-00000...; rename so the
    # second delivery sorts AFTER it (monotone container names)
    run()
    assert spark.read.parquet(out).count() == 5

    df2 = spark.createDataFrame(
        [(f"https://e.com/b/{i}", f"<p>late {i}</p>") for i in range(3)],
        "target_uri string, body string",
    ).coalesce(1)
    import os

    tmp2 = str(tmp_path / "second")
    write_warc(df2, tmp2)
    os.rename(
        os.path.join(tmp2, "part-00000.warc.gz"),
        os.path.join(src, "part-00001.warc.gz"),
    )
    run()
    got = spark.read.parquet(out)
    assert got.count() == 8
    assert got.where("target_uri LIKE '%/b/%'").count() == 3


def test_warc_datasource_writer_round_trip(spark, tmp_path):
    """df.write.format('warc').save: per-task containers committed by
    rename, readable by both readers, overwrite mode replaces."""
    from python_etl_spark.sources.warc import register_warc_source

    register_warc_source(spark)
    out = str(tmp_path / "w")
    df = spark.createDataFrame(
        [(f"https://e.com/w/{i}", f"<p>{i}</p>") for i in range(12)],
        "target_uri string, body string",
    ).repartition(3)
    df.write.format("warc").mode("append").save(out)
    import os

    files = sorted(n for n in os.listdir(out) if n.endswith(".warc.gz"))
    assert files == [f"part-{i:05d}.warc.gz" for i in range(3)]
    back = spark.read.format("warc").load(out).where(
        "warc_type = 'response'"
    )
    assert back.count() == 12
    got = {r["target_uri"] for r in back.collect()}
    assert got == {f"https://e.com/w/{i}" for i in range(12)}

    # overwrite replaces the old containers
    df2 = spark.createDataFrame(
        [("https://e.com/new/0", "<p>new</p>")],
        "target_uri string, body string",
    ).coalesce(1)
    df2.write.format("warc").mode("overwrite").save(out)
    back2 = spark.read.format("warc").load(out).where(
        "warc_type = 'response'"
    )
    assert [r["target_uri"] for r in back2.collect()] == [
        "https://e.com/new/0"
    ]


def test_warc_writer_append_preserves_existing_parts(spark, tmp_path):
    """A second mode('append') write into a non-empty directory must
    continue part numbering after the existing max index — never
    delete or replace the earlier commit's containers."""
    from python_etl_spark.sources.warc import register_warc_source

    register_warc_source(spark)
    out = str(tmp_path / "w")
    first = spark.createDataFrame(
        [(f"https://e.com/a/{i}", f"<p>a{i}</p>") for i in range(4)],
        "target_uri string, body string",
    ).repartition(2)
    first.write.format("warc").mode("append").save(out)
    import os

    before = sorted(n for n in os.listdir(out) if n.endswith(".warc.gz"))
    assert before == ["part-00000.warc.gz", "part-00001.warc.gz"]
    sig0 = {n: os.path.getsize(os.path.join(out, n)) for n in before}

    second = spark.createDataFrame(
        [(f"https://e.com/b/{i}", f"<p>b{i}</p>") for i in range(3)],
        "target_uri string, body string",
    ).repartition(2)
    second.write.format("warc").mode("append").save(out)
    after = sorted(n for n in os.listdir(out) if n.endswith(".warc.gz"))
    assert after == [f"part-{i:05d}.warc.gz" for i in range(4)]
    # the first commit's files are byte-untouched
    for n, sz in sig0.items():
        assert os.path.getsize(os.path.join(out, n)) == sz
    back = spark.read.format("warc").load(out).where(
        "warc_type = 'response'"
    )
    got = {r["target_uri"] for r in back.collect()}
    assert got == {f"https://e.com/a/{i}" for i in range(4)} | {
        f"https://e.com/b/{i}" for i in range(3)
    }


def test_warc_readers_and_sweep_ignore_foreign_tmp_files(spark, tmp_path):
    """A concurrent job's in-flight _tmp-* file is (a) invisible to
    both readers and (b) NOT deleted by another writer's commit sweep
    (the sweep is scoped to the committing job's own run id)."""
    from python_etl_spark.sources.warc import register_warc_source

    register_warc_source(spark)
    out = tmp_path / "w"
    out.mkdir()
    foreign = out / "_tmp-deadbeef0123-aaaaaaaaaaaa.warc.gz"
    foreign.write_bytes(b"in-flight garbage from another job")

    df = spark.createDataFrame(
        [("https://e.com/x/0", "<p>x</p>")],
        "target_uri string, body string",
    ).coalesce(1)
    df.write.format("warc").mode("append").save(str(out))
    assert foreign.exists(), "foreign tmp file must survive the sweep"
    back = spark.read.format("warc").load(str(out)).where(
        "warc_type = 'response'"
    )
    assert back.count() == 1


def _mk_containers(spark, tmp_path, src, n, prefix="cc"):
    """n single-record containers with monotone names under src."""
    import os

    from python_etl_spark.sources.warc import write_warc

    os.makedirs(src, exist_ok=True)
    for i in range(n):
        stage = str(tmp_path / f"_stage{prefix}{i}")
        write_warc(
            spark.createDataFrame(
                [(f"https://e.com/{prefix}/{i}", f"<p>{i}</p>")],
                "target_uri string, body string",
            ).coalesce(1),
            stage,
        )
        os.rename(
            os.path.join(stage, "part-00000.warc.gz"),
            os.path.join(src, f"{prefix}-{i:05d}.warc.gz"),
        )


def test_warc_stream_plan_path_reads_no_container_bytes(
    spark, tmp_path, monkeypatch
):
    """r11 verdict #1 pin (a): the driver-side plan/offset path
    (initialOffset/latestOffset/partitions/commit) opens NO container
    file — only executors read bytes. Also pins the admission
    contract: latestOffset never self-advances; only partitions()/
    commit() move the position."""
    import builtins

    from python_etl_spark.sources.warc import _WarcStreamReader

    src = str(tmp_path / "drop")
    _mk_containers(spark, tmp_path, src, 7)

    reader = _WarcStreamReader(
        {"path": src, "maxFilesPerTrigger": "3", "streamId": "s1"}
    )
    real_open = builtins.open

    def guarded_open(path, *a, **kw):
        if ".warc" in str(path):
            raise AssertionError(
                f"driver plan path opened a container: {path}"
            )
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", guarded_open)
    start = reader.initialOffset()
    assert start == {"last": ""}
    end = reader.latestOffset()
    assert end == {"last": "cc-00002.warc.gz"}  # capped at 3
    # never self-advance: repeated polls return the SAME target
    assert reader.latestOffset() == end
    parts = reader.partitions(start, end)
    assert len(parts) == 3
    reader.commit(end)
    # a planned batch moved the position: next slice
    end2 = reader.latestOffset()
    assert end2 == {"last": "cc-00005.warc.gz"}
    parts2 = reader.partitions(end, end2)
    assert len(parts2) == 3
    # degenerate replay (e <= s) plans nothing and keeps the position
    assert reader.partitions(end2, end2) == []
    assert reader.latestOffset() == {"last": "cc-00006.warc.gz"}
    monkeypatch.setattr(builtins, "open", real_open)
    # executors DO read bytes: one partition round-trips its record
    rows = list(reader.read(parts[0]))
    assert len(rows) >= 1
    # sidecar keeps a RESTARTED capped stream bounded from batch one
    r2 = _WarcStreamReader(
        {"path": src, "maxFilesPerTrigger": "3", "streamId": "s1"}
    )
    assert r2.latestOffset() == {"last": "cc-00005.warc.gz"}
    # without a streamId, the cap warns about the restart hole
    with pytest.warns(UserWarning, match="UNBOUNDED"):
        _WarcStreamReader({"path": src, "maxFilesPerTrigger": "3"})


def test_warc_stream_backfill_drains_bounded_with_restart(
    spark, tmp_path
):
    """r11 verdict #1 pin (b): a 20-container backfill drains in
    bounded batches (maxFilesPerTrigger=4 -> at most 4 containers per
    availableNow run), survives a mid-backfill checkpoint restart
    (every run IS a fresh query from the same checkpoint), and loses/
    duplicates nothing."""
    from python_etl_spark.sources.warc import register_warc_source

    register_warc_source(spark)
    src = str(tmp_path / "backfill")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _mk_containers(spark, tmp_path, src, 20)

    def run_once():
        q = (
            spark.readStream.format("warc")
            .option("maxFilesPerTrigger", "4")
            .option("streamId", "backfill-1")
            .load(src)
            .where("warc_type = 'response'")
            .select("target_uri")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out).count()

    seen = 0
    counts = []
    for _ in range(8):
        n = run_once()
        counts.append(n - seen)
        seen = n
        if seen >= 20:
            break
    assert seen == 20, counts
    # every batch bounded by the cap
    assert all(c <= 4 for c in counts), counts
    assert max(counts) > 0
    # exactly-once: no duplicate URIs across the restarts
    got = spark.read.parquet(out)
    assert got.distinct().count() == 20
