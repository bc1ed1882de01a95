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


def test_segment_dedup_keeps_first_occurrence_and_reassembles(spark, tmp_path):
    """C4-style segment dedup on a crafted corpus: an 8-token segment
    repeated across docs survives only in the earliest (doc_id, pos);
    surviving text reassembles in original order; a fully-duplicated
    doc comes back empty."""
    seg_a = "a b c d e f g h"          # exactly one 8-token segment
    seg_b = "p q r s t u v w"
    seg_c = "one two three four five six seven eight"
    rows = [
        (0, f"{seg_a} {seg_b}"),       # doc 0: A at pos0, B at pos1
        (1, f"{seg_b} {seg_c}"),       # doc 1: B dropped (doc0 has it), C kept
        (2, seg_a),                    # doc 2: fully duplicated -> empty
        (3, "tail only three"),        # doc 3: short doc, unique segment
    ]
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf}/documents.parquet")

    from python_etl_spark.plans.training import text_segment_dedup

    got = {
        r.doc_id: (r.n_seg, r.n_kept, r.text_out)
        for r in text_segment_dedup(spark, sf).collect()
    }
    assert got[0] == (2, 2, f"{seg_a} {seg_b}")
    assert got[1] == (2, 1, seg_c)
    assert got[2] == (1, 0, "")
    assert got[3] == (1, 1, "tail only three")


def test_quality_fit_cramer_weights_match_numpy(spark, sf_dir):
    """The engine-side Cramer solve (det-scaled integer weights) must
    agree with numpy's least squares on the same design matrix, and
    the registered predictions must equal X @ w rounded at 6."""
    import numpy as np

    from python_etl_spark.plans import QUERIES
    from python_etl_spark.plans.training import _qf_feats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    f = _qf_feats(docs).collect()
    X = np.array([[1.0, r["x1"], r["x2"]] for r in f])
    y = np.array([float(r["y"]) for r in f])
    w, *_ = np.linalg.lstsq(X, y, rcond=None)

    got = {
        r["doc_id"]: r["y_pred"]
        for r in QUERIES["text_quality_fit_predict"](spark, sf_dir).collect()
    }
    pred = X @ w
    ids = [r["doc_id"] for r in f]
    for i, did in enumerate(ids):
        assert abs(got[did] - pred[i]) < 2e-6, (did, got[did], pred[i])
    # the fit is non-trivial: predictions correlate with the target
    gv = np.array([got[d] for d in ids])
    assert np.corrcoef(gv, y)[0, 1] > 0.5


def test_cjk_bigrams_and_detector_on_real_scripts(spark):
    """Char-bigram fallback on REAL CJK strings: Japanese (kana+han),
    Chinese, Korean, mixed ascii+CJK, ascii-only, empty — bigram
    lists, mixed token stream, and the no-space-script detector."""
    from pyspark.sql import functions as F

    from python_etl_spark.functions.text import (
        cjk_char_bigrams,
        cjk_char_count,
        mixed_script_tokens,
        no_space_script_ratio,
    )

    df = spark.createDataFrame(
        [
            (1, "東京タワーは高い"),          # ja: one 8-char run
            (2, "我爱北京天安门"),            # zh: one 7-char run
            (3, "한국어 문서입니다"),          # ko: two runs (space)
            (4, "use the 漢字 tokenizer"),   # mixed: isolated 2-char run
            (5, "plain english only"),
            (6, "字"),                       # single isolated char
        ],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            cjk_char_bigrams("text").alias("bg"),
            cjk_char_count("text").alias("nc"),
            mixed_script_tokens("text").alias("mix"),
            F.round(no_space_script_ratio("text"), 2).alias("ratio"),
        ).collect()
    }
    assert rows[1]["bg"] == [
        "東京", "京タ", "タワ", "ワー", "ーは", "は高", "高い",
    ]
    assert rows[2]["bg"] == ["我爱", "爱北", "北京", "京天", "天安", "安门"]
    assert rows[3]["bg"] == ["한국", "국어", "문서", "서입", "입니", "니다"]
    assert rows[3]["nc"] == 8
    assert rows[4]["bg"] == ["漢字"]
    assert rows[4]["mix"] == ["use", "the", "tokenizer", "漢字"]
    assert rows[5]["bg"] == [] and rows[5]["ratio"] == 0.0
    assert rows[6]["bg"] == ["字"]  # isolated char stays a token
    assert rows[1]["ratio"] == 1.0
    assert 0.0 < rows[4]["ratio"] < 0.3  # detector: mostly-ascii doc
    # token counts: ja doc counts 7 mixed tokens, ws-split would say 1
    assert len(rows[1]["mix"]) == 7
