"""Mini byte-pair encoding: train a merge table from corpus pair
counts, apply it with an Arrow-batched UDF — so mixture/packing token
budgets can be real tokenizer tokens instead of whitespace counts.

Training is the classic Sennrich et al. 2016 loop over AGGREGATED word
-type counts (word, count): count adjacent symbol pairs weighted by
word frequency, merge the most frequent pair everywhere, repeat. The
corpus-scale work — aggregating the (word, count) table — is a single
distributed groupBy; the loop itself runs driver-side over the type
table, which ``corpus_word_counts`` hard-caps to a deterministic
top-``MAX_TRAIN_TYPES`` head (count desc, word asc) BEFORE collecting
— multilingual web text has unbounded distinct types (typos, URLs,
unicode junk), so an uncapped collect is a driver OOM at scale, while
the Zipf head the cap keeps is what determines the top-K merges
anyway. Same bounded-model-state class as the k-means/IVF/PQ
codebooks; production tokenizer trainers cap/sample the same way.

Apply spec (mirrored EXACTLY by the ``text_bpe_tokens_checked`` DuckDB
oracle, and by the recursive SQL there): a word becomes the symbol
sequence ``[c1, c2, ..., '</w>']``; merges are applied strictly in rank
order, each merge exhaustively replacing its LEFTMOST occurrence until
none remain, before moving to the next rank. (For BPE merge tables this
is equivalent to the classic lowest-rank-first application: a merge's
operands exist only after all lower-ranked merges, so a higher rank can
never enable a lower one.)

Deterministic tie-break everywhere: highest count first, then pair
lexicographic ascending — two engines and two runs always learn and
apply the identical table.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def train_bpe(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from (word, count) pairs.
    Deterministic: ties broken by (count desc, pair lexicographic)."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(list(w) + [EOW]): c for w, c in word_counts
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def apply_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a merge table (rank-order exhaustive
    leftmost application — see module docstring for the spec)."""
    syms = list(word) + [EOW]
    for a, b in merges:
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i : i + 2] = [a + b]
            else:
                i += 1
    return syms


def bpe_token_count_col(
    word_col: str | Column, merges: list[tuple[str, str]]
) -> Column:
    """Arrow-batched token count per WORD TYPE. Run this on the
    distinct-types frame (tiny), never on the exploded token stream —
    the per-type results broadcast-join back to the corpus, so the
    Python stage is O(#types) regardless of corpus size."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type annotations: postponed evaluation (future annotations)
    # would leave them as unresolvable strings for pyspark's inspector
    @pandas_udf("int", PandasUDFType.SCALAR)
    def ntok(s):
        return s.map(lambda w: len(apply_bpe(w, merges)))

    col = F.col(word_col) if isinstance(word_col, str) else word_col
    return ntok(col)


def doc_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document whitespace vs BPE token counts.

    Plan: explode words → (doc, word) counts (one shuffle, map-side
    combined) → distinct types tokenized by the Arrow UDF (O(#types)
    Python work) → broadcast the per-type token counts back → one
    grouped sum. The 100 TB shape: the corpus is touched by exactly one
    shuffle; the Python stage never sees it."""
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+", -1)).alias("w"),
    ).where(F.col("w") != "")
    per_doc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("n"))
    types = per_doc.select("w").distinct().select(
        "w", bpe_token_count_col("w", merges).alias("w_tokens")
    )
    return (
        per_doc.join(F.broadcast(types), "w")
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_ws_tokens"),
            F.sum(F.col("n") * F.col("w_tokens")).cast("long").alias(
                "n_bpe_tokens"
            ),
        )
    )


#: Default driver-side cap on the collected type table. Trained merge
#: tables converge on the HEAD of the Zipf curve; the tail (typos,
#: URLs, numeric junk — billions of distinct types on multilingual web
#: text) adds nothing to the top-K pair counts but would OOM the
#: driver. Production tokenizer trainers cap/sample the same way.
MAX_TRAIN_TYPES = 262_144


def corpus_word_counts(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_types: int | None = MAX_TRAIN_TYPES,
) -> list[tuple[str, int]]:
    """Aggregated (word, count) type table for training — the single
    corpus-scale pass (distributed groupBy with map-side combine).

    The collect is BOUNDED model state: a ``min_count`` floor plus a
    deterministic top-``max_types`` cut (count desc, then word asc —
    two runs and two engines keep the identical head) run distributed
    BEFORE the collect, so the driver never pulls more than
    ``max_types`` rows no matter how many distinct types the corpus
    has. Same bounded-sample → driver-fit → broadcast posture as the
    PQ codebooks (operators/similarity.py). ``max_types=None``
    disables the cap (tests / tiny corpora only)."""
    counts = (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+", -1)).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        counts = counts.where(F.col("n") >= min_count)
    if max_types is not None:
        counts = counts.orderBy(F.desc("n"), F.asc("w")).limit(max_types)
    rows = counts.collect()
    return sorted((r["w"], r["n"]) for r in rows)
