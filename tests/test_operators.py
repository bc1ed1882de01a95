"""Unit-level semantics of the custom operators (as-of join,
sessionize) on crafted inputs with hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from python_etl_spark.operators.asof import asof_join
from python_etl_spark.operators.sessionize import sessionize


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L10"), (1, _ts(20), "L20"), (2, _ts(5), "L5")],
        "k long, ts timestamp_ntz, lv string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), "R10"), (1, _ts(15), "R15"), (2, _ts(6), "R6")],
        "k long, rts timestamp_ntz, rv string",
    )
    got = {
        (r.k, r.lv): r.rv
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_cols=["rv"],
        ).collect()
    }
    assert got == {
        (1, "L10"): "R10",   # equal timestamps match (inclusive)
        (1, "L20"): "R15",   # latest right <= left
        (2, "L5"): None,      # right is in the future -> no match
    }


def test_asof_rejects_payload_collision(spark):
    import pytest

    left = spark.createDataFrame(
        [(1, _ts(10), "a")], "k long, ts timestamp_ntz, v string"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), "b")], "k long, rts timestamp_ntz, v string"
    )
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts")


def test_sessionize_gap_boundaries(spark):
    events = spark.createDataFrame(
        [
            (1, _ts(0), 1.0, 100),
            (1, _ts(29), 1.0, 101),   # 29min gap: same session
            (1, _ts(59), 1.0, 102),   # 30min gap exactly: same (strict >)
            (2, _ts(0), 5.0, 103),
        ],
        "user_id long, ts timestamp_ntz, value double, event_id long",
    )
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.total_value)
        for r in sessionize(
            events, gap_minutes=30, tiebreak_col="event_id", value_col="value"
        ).collect()
    }
    assert got == {(1, 1): (3, 3.0), (2, 1): (1, 5.0)}

    strict = spark.createDataFrame(
        [(1, _ts(0), 1.0, 1), (1, _ts(31), 2.0, 2)],
        "user_id long, ts timestamp_ntz, value double, event_id long",
    )
    got2 = sessionize(
        strict, gap_minutes=30, tiebreak_col="event_id", value_col="value"
    ).collect()
    assert len(got2) == 2  # 31min gap splits


def test_multimodal_stub(spark):
    from python_etl_spark.operators.multimodal import (
        attach_payload,
        decode_media,
        frame_sample,
    )
    import pytest

    docs = spark.createDataFrame(
        [(0, "abcd"), (1, "ab"), (2, "abcdefgh")], "doc_id long, text string"
    )
    payloads = attach_payload(docs)
    meta = {r.doc_id: (r.fmt, r.byte_len, r.width, r.height)
            for r in decode_media(payloads).collect()}
    assert meta[0] == ("png", 4, 68, 68)
    assert meta[1][0] == "jpg" and meta[2][0] == "wav"
    frames = frame_sample(payloads, every_nth=2, max_frames=3).groupBy(
        "doc_id").count().collect()
    assert {r.doc_id: r["count"] for r in frames} == {0: 3, 1: 2, 2: 3}
    with pytest.raises(NotImplementedError):
        decode_media(payloads, real_decoder=True)
