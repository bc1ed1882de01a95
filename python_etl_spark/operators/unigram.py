"""Unigram-LM (SentencePiece-style) tokenizer: EM-pruned piece
vocabulary over the capped word-type table, Viterbi segmentation.

Kudo 2018's unigram language model, reduced to the same
bounded-model-state posture as operators/bpe.py: the corpus-scale work
is ONE distributed (word, count) aggregation (``corpus_word_counts``,
hard-capped head), the EM loop runs driver-side over that type table,
and application is an Arrow-batched UDF over DISTINCT types whose
results broadcast-join back to the corpus — the Python stage is
O(#types) regardless of corpus size.

Training spec (deterministic; mirrored by the pure-Python reference in
tests/test_text_functions.py):

1. SEED: every substring of length 1..``max_piece_len`` of every word
   type, weighted by type count; cap to the top ``4 * vocab_size``
   pieces (count desc, piece asc) plus ALL single characters (coverage
   floor — Viterbi must never dead-end).
2. EM iterations: E-step segments each type with Viterbi under current
   log-probs (ties: higher score, then FEWER pieces, then lexicographic
   piece list — total order, replay-stable) and accumulates
   count-weighted piece counts; M-step keeps the top ``vocab_size``
   pieces by expected count (count desc, piece asc) plus all single
   chars, re-normalizing probabilities with a count floor of 1 so kept
   chars never hit log(0) (the pruning step of Kudo's algorithm,
   simplified from loss-based to count-based ranking).
3. APPLY: Viterbi with the final model; characters unseen in training
   fall back to a floor log-prob so arbitrary text still tokenizes.

The greedy longest-match variant (``greedy_tokenize``) exists for the
SQL-expressible checked twin (plans/llm.py
``text_unigram_tokens_checked``): max-munch from the left over a fixed
vocabulary IS replayable by a DuckDB recursive CTE, unlike Viterbi.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: floor log-prob for characters never seen in training (apply-time
#: robustness; large negative so real pieces always win)
UNK_LOGP = -100.0


def seed_pieces(
    word_counts: list[tuple[str, int]],
    vocab_size: int,
    max_piece_len: int = 4,
) -> dict[str, int]:
    """Capped substring seed vocabulary: top ``4 * vocab_size`` pieces
    by weighted occurrence count (count desc, piece asc) + all single
    chars."""
    seed: Counter = Counter()
    chars: set[str] = set()
    for w, c in word_counts:
        for i in range(len(w)):
            chars.add(w[i])
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                seed[w[i : i + ln]] += c
    head = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = {p for p, _ in head[: 4 * vocab_size]} | chars
    return {p: seed[p] for p in keep}


def viterbi_tokenize(
    word: str, logp: dict[str, float], max_piece_len: int = 4
) -> list[str]:
    """Best segmentation under the unigram model. Deterministic ties:
    higher score, then fewer pieces, then lexicographically smaller
    piece list. Unknown single chars get ``UNK_LOGP``."""
    n = len(word)
    # best[i]: (score, n_pieces, pieces) for word[:i]
    best: list[tuple[float, int, list[str]] | None] = [None] * (n + 1)
    best[0] = (0.0, 0, [])
    for i in range(1, n + 1):
        cand: tuple[float, int, list[str]] | None = None
        for ln in range(1, min(max_piece_len, i) + 1):
            prev = best[i - ln]
            if prev is None:
                continue
            p = word[i - ln : i]
            lp = logp.get(p)
            if lp is None:
                if ln > 1:
                    continue
                lp = UNK_LOGP  # single-char coverage fallback
            c = (prev[0] + lp, prev[1] + 1, prev[2] + [p])
            if (
                cand is None
                or c[0] > cand[0] + 1e-12
                or (abs(c[0] - cand[0]) <= 1e-12 and (c[1], c[2]) < (cand[1], cand[2]))
            ):
                cand = c
        best[i] = cand
    assert best[n] is not None  # single-char fallback guarantees reach
    return best[n][2]


def train_unigram(
    word_counts: list[tuple[str, int]],
    vocab_size: int = 512,
    max_piece_len: int = 4,
    iters: int = 2,
) -> dict[str, float]:
    """EM-pruned unigram model over the (word, count) type table.
    Returns piece -> log-prob. Driver-side over the CAPPED table only
    (pass the output of ``corpus_word_counts`` — never raw text)."""
    seed = seed_pieces(word_counts, vocab_size, max_piece_len)
    chars = {p for p in seed if len(p) == 1}
    total = sum(seed.values()) or 1
    logp = {p: math.log(c / total) for p, c in seed.items()}
    for _ in range(iters):
        counts: Counter = Counter()
        for w, c in word_counts:
            for p in viterbi_tokenize(w, logp, max_piece_len):
                counts[p] += c
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        keep = {p for p, _ in ranked[:vocab_size]} | chars
        tot = sum(max(counts.get(p, 0), 1) for p in keep)
        logp = {
            p: math.log(max(counts.get(p, 0), 1) / tot) for p in keep
        }
    return logp


def greedy_tokenize(word: str, vocab: set[str], max_piece_len: int = 4):
    """Max-munch longest-match-from-left over a fixed piece vocabulary
    (MUST contain every single char of ``word``) — the SQL-replayable
    twin of Viterbi segmentation."""
    out: list[str] = []
    i = 0
    n = len(word)
    while i < n:
        for ln in range(min(max_piece_len, n - i), 0, -1):
            p = word[i : i + ln]
            if p in vocab or ln == 1:
                out.append(p)
                i += ln
                break
    return out


def _count_col(word_col: str | Column, fn) -> Column:
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type annotations: postponed evaluation (future annotations)
    # would leave them as unresolvable strings for pyspark's inspector
    @pandas_udf("int", PandasUDFType.SCALAR)
    def ntok(s):
        return s.map(fn)

    col = F.col(word_col) if isinstance(word_col, str) else word_col
    return ntok(col)


def doc_piece_counts(
    docs: DataFrame,
    tokenizer,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "n_unigram_tokens",
) -> DataFrame:
    """Per-document whitespace vs unigram-piece token counts —
    operators/bpe.doc_token_counts' exact plan shape: one corpus
    shuffle for (doc, word) counts, an Arrow stage over the tiny
    DISTINCT-types frame (``tokenizer``: word -> n pieces), broadcast
    join back, grouped sum. The 100 TB posture: the Python stage never
    sees the corpus."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+", -1)).alias("w"),
    ).where(F.col("w") != "")
    per_doc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("n"))
    types = per_doc.select("w").distinct().select(
        "w", _count_col("w", lambda w: len(tokenizer(w))).alias("w_tokens")
    )
    return (
        per_doc.join(F.broadcast(types), "w")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_ws_tokens"),
            F.sum(F.col("n") * F.col("w_tokens")).cast("long").alias(
                out_col
            ),
        )
    )
