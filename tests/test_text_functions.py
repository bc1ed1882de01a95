"""Property tests for the text function library."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from python_etl_spark.functions.text import fingerprint, normalize_ws

WORDS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=6), min_size=1, max_size=8
)


@settings(max_examples=20, deadline=None)
@given(WORDS)
def test_fingerprint_invariant_to_order_and_dupes(spark, words):
    a = " ".join(words)
    b = " ".join(sorted(words, reverse=True) + [words[0]])  # reorder + dupe
    df = spark.createDataFrame([(a,), (b,)], "text string")
    fps = [r.fp for r in df.select(fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


@settings(max_examples=20, deadline=None)
@given(WORDS)
def test_normalize_ws_idempotent(spark, words):
    messy = "  " + "   ".join(w.upper() for w in words) + " "
    df = spark.createDataFrame([(messy,)], "text string")
    once = df.select(normalize_ws("text").alias("t"))
    twice = once.select(normalize_ws("t").alias("t"))
    assert once.first().t == twice.first().t
    assert "  " not in once.first().t
