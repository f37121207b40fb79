"""Byte-pair-encoding tokenizer training and application.

The missing piece between :func:`maps_spark.operators.corpus.
build_vocab` (word-level ids) and a production token stream: LEARN the
subword merge table from the corpus, then encode with it.

Shape (the standard Sennrich et al. 2016 word-level algorithm,
arXiv:1508.07909, distributed the way practical trainers do it):

- the corpus-sized work is ONE distributed pass building word
  frequencies (shuffle keyed by word, map-side combine) — identical
  cost to ``build_vocab``;
- the merge loop then runs driver-side over that bounded word-frequency
  table (capped at ``max_words`` by TakeOrdered, so driver memory is
  bounded no matter the corpus size; training on the top-V words is
  what hosted tokenizer trainers do on samples). Every step is
  deterministic: the best pair maximizes (count, then lexicographic
  pair) — no hash-order or RNG dependence;
- application is an Arrow-batched pandas UDF with the merge ranks
  broadcast (greedy lowest-rank merging per word, the exact BPE encode
  rule), so encoding 100 TB is embarrassingly parallel.

The driver-side trainer and the encoder are not SQL-expressible (the
greedy encode loop is data-dependent), so they carry no DuckDB oracle:
correctness is pinned by golden-example, roundtrip, and determinism
tests instead (tests/test_bpe.py). The DISTRIBUTED trainer below IS
oracle-expressible for a fixed round count (each round is an
aggregation plus a fold, unrolled per round) — the `bpe_merges` gate
hash-checks it against DuckDB, and a test pins it equal to the
driver-side trainer.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

END = "</w>"  # end-of-word marker, standard BPE word terminator


def word_counts(docs: DataFrame, text_col: str = "text",
                max_words: int = 100_000) -> list[tuple[str, int]]:
    """Top-``max_words`` (word, count) pairs — the one corpus-sized
    pass; ties at the cutoff break lexicographically."""
    from maps_spark.operators.text import _doc_tokens
    rows = (_doc_tokens(docs, text_col)
            .groupBy("word").agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), "word").limit(max_words).collect())
    return [(r["word"], r["cnt"]) for r in rows]


def train_bpe(docs: DataFrame, n_merges: int = 200,
              text_col: str = "text", max_words: int = 100_000,
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges. Returns the ordered merge list
    ``[(left, right), ...]`` (rank = list position). Stops early when
    no pair reaches ``min_pair_count``."""
    vocab = {tuple(w) + (END,): c
             for w, c in word_counts(docs, text_col, max_words)}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # highest count, ties to the lexicographically SMALLEST pair
        (a, b), best_cnt = min(pairs.items(),
                               key=lambda kv: (-kv[1], kv[0]))
        if best_cnt < min_pair_count:
            break
        merged = a + b
        out = {}
        for sym, c in vocab.items():
            if a in sym:  # cheap prefilter
                new, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == a and sym[i+1] == b:
                        new.append(merged)
                        i += 2
                    else:
                        new.append(sym[i])
                        i += 1
                out[tuple(new)] = out.get(tuple(new), 0) + c
            else:
                out[sym] = out.get(sym, 0) + c
        vocab = out
        merges.append((a, b))
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the
    lowest-ranked adjacent pair (the canonical decode-compatible
    order), until no learned pair remains."""
    sym = list(word) + [END]
    while len(sym) > 1:
        cand = [(ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(sym, sym[1:]))
                if (a, b) in ranks]
        if not cand:
            break
        _r, i = min(cand)
        sym[i:i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text") -> DataFrame:
    """Encode every document with a learned merge table.

    The ranks dict is closure-captured (broadcast with the serialized
    UDF — a merge table is KBs); per-batch the UDF memoizes word
    encodings, so the cost is per DISTINCT word per batch, not per
    token. Output: (doc_id, n_tokens, n_bpe_tokens, bpe_text) where
    bpe_text joins subwords with spaces and words keep their ``</w>``
    terminator (roundtrip: remove spaces, split on the marker).
    """
    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("struct<n_tokens: long, n_bpe_tokens: long, "
                "bpe_text: string>")
    def _enc(texts: pd.Series) -> pd.DataFrame:
        memo: dict[str, list[str]] = {}
        nt, nb, bt = [], [], []
        for t in texts:
            words = [w for w in (t or "").split(" ") if w]
            pieces: list[str] = []
            for w in words:
                if w not in memo:
                    memo[w] = encode_word(w, ranks)
                pieces.extend(memo[w])
            nt.append(len(words))
            nb.append(len(pieces))
            bt.append(" ".join(pieces))
        return pd.DataFrame({"n_tokens": nt, "n_bpe_tokens": nb,
                             "bpe_text": bt})

    enc = _enc(F.col(text_col))
    return docs.select("doc_id", enc.alias("e")).select(
        "doc_id", "e.n_tokens", "e.n_bpe_tokens", "e.bpe_text")


def train_bpe_distributed(docs: DataFrame, n_merges: int = 4,
                          text_col: str = "text",
                          min_pair_count: int = 2) -> DataFrame:
    """The fully distributed merge loop — for the regime where even
    the word-frequency table exceeds one machine (the 100 TB-vocab
    path :func:`train_bpe`'s bounded driver loop documents away).

    Each round is two distributed steps over the symbolized vocab:
    an adjacent-pair explode + count-weighted aggregation (shuffle
    keyed by pair), and a leftmost-greedy merge applied as a pure
    Column fold. Only the winning pair (ONE row: TakeOrdered with
    count-desc, lexicographic tie-break) ever reaches the driver, so
    driver memory is O(n_merges). The vocab is localCheckpointed per
    round to keep the plan one round deep.

    Unlike the driver-side trainer this IS oracle-expressible for
    fixed ``n_merges`` (unrolled CTEs, same fold) — the `bpe_merges`
    gate hash-checks 4 rounds against DuckDB.

    Output: (rank, lhs, rhs, pair_count) — the ordered merge table.
    """
    from maps_spark.operators.text import _doc_tokens
    spark = docs.sparkSession
    vocab = (_doc_tokens(docs, text_col)
             .groupBy("word").agg(F.count("*").alias("cnt"))
             .select(F.concat(F.split("word", ""),
                              F.array(F.lit(END))).alias("sym"), "cnt")
             .localCheckpoint())
    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):
        pairs = (vocab.where(F.size("sym") >= 2)
                 .select(F.explode(F.expr(
                     "zip_with(slice(sym, 1, size(sym) - 1), "
                     "         slice(sym, 2, size(sym) - 1), "
                     "         (a, b) -> struct(a, b))")).alias("p"),
                     "cnt")
                 .groupBy(F.col("p.a").alias("lhs"),
                          F.col("p.b").alias("rhs"))
                 .agg(F.sum("cnt").alias("c")))
        best = pairs.orderBy(F.desc("c"), "lhs", "rhs").limit(1).collect()
        if not best or best[0]["c"] < min_pair_count:
            break
        a, b, c = best[0]["lhs"], best[0]["rhs"], int(best[0]["c"])
        merges.append((r, a, b, c))
        fold = F.aggregate(
            F.col("sym"), F.expr("CAST(array() AS array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0) &
                (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
                F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                         F.array(F.lit(a + b)))
            ).otherwise(F.concat(acc, F.array(x))))
        vocab = vocab.select(fold.alias("sym"), "cnt").localCheckpoint()
    return spark.createDataFrame(
        merges, "rank long, lhs string, rhs string, pair_count long")
