"""Text-analysis operators for training-data pipelines.

Beyond the reference's scope (SURVEY §7 phase 4 extension point): the
operations a 100 TB text-corpus pipeline runs over a ``documents``
table. Everything except the rolling-hash fingerprint is pure Column
arithmetic (whole-stage codegen; dual-dialect for the oracle).

Portability notes for the oracle: token/occurrence counts use the
replace-length trick (``(len(s) - len(replace(s, t, ''))) / len(t)``)
instead of regex, because Spark (Java regex) and DuckDB (RE2) disagree
on pattern dialects but agree exactly on ``length``/``replace``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf

# language marker words: high-frequency function words per language.
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " que "],
    "fr": [" le ", " et ", " les "],
    "de": [" der ", " und ", " die "],
    "zh": ["的", "是", "了"],
}

STOPWORDS = [" the ", " a ", " and ", " of ", " to ", " in "]


def occurrences_sql(col: str, token: str) -> str:
    """Dual-dialect count of non-overlapping ``token`` occurrences."""
    esc = token.replace("'", "''")
    n = len(token)
    return (f"CAST((length({col}) - length(replace({col}, '{esc}', '')))"
            f" / {n} AS BIGINT)")


def occurrences(col: str, token: str) -> Column:
    return F.expr(occurrences_sql(col, token))


def text_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: token count, stopword count, whitespace
    ratio, mean token length, quality score — all JVM-side."""
    padded = f"' ' || {text_col} || ' '"
    n_tokens = F.expr(
        f"CAST((length({text_col}) - length(replace({text_col}, ' ', '')))"
        f" AS BIGINT) + 1")
    n_stop = None
    for t in STOPWORDS:
        c = F.expr(occurrences_sql(padded, t))
        n_stop = c if n_stop is None else n_stop + c
    length = F.length(text_col).cast("long")
    return docs.select(
        "doc_id",
        length.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        (F.expr(f"CAST(length({text_col}) - "
                f"length(replace({text_col}, ' ', '')) AS BIGINT)")
         ).alias("n_spaces"),
        (length.cast("double") / n_tokens.cast("double"))
        .alias("mean_token_len"),
    )


# GPT-2-style pre-tokenizer, restricted to constructs Java regex and
# RE2 agree on (no lookahead — RE2 has none): contractions, letter
# runs, digit runs, punctuation runs, whitespace runs.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token counting, JVM-side (``regexp_count`` stays in
    codegen — no Python in the hot path): (doc_id, n_bpe_tokens,
    n_ws_tokens)."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN))
        .cast("long").alias("n_bpe_tokens"),
        (F.length(text_col) - F.length(F.replace(F.col(text_col),
                                                 F.lit(" "), F.lit(""))) + 1)
        .cast("long").alias("n_ws_tokens"))


def quality_score(docs: DataFrame, text_col: str = "text",
                  min_tokens: int = 16, max_mean_token_len: float = 12.0
                  ) -> DataFrame:
    """Heuristic quality gate (C4-style corpus filters, public recipe):
    stopword density + length windows -> keep flag."""
    f = text_features(docs, text_col)
    stop_ratio = (F.col("n_stopwords").cast("double") /
                  F.col("n_tokens").cast("double"))
    keep = ((F.col("n_tokens") >= min_tokens) &
            (F.col("mean_token_len") <= max_mean_token_len) &
            (stop_ratio > 0.001))
    return f.select("doc_id", "n_tokens", "mean_token_len",
                    stop_ratio.alias("stopword_ratio"),
                    keep.alias("keep"))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/marker-count language ID: argmax of per-language marker
    occurrences; ties and zero-evidence -> 'und'. Deterministic and
    SQL-portable (greatest + CASE)."""
    padded = f"(' ' || {text_col} || ' ')"
    scores = {lang: " + ".join(occurrences_sql(padded, m) for m in marks)
              for lang, marks in LANG_MARKERS.items()}
    langs = list(scores)
    greatest = f"greatest({', '.join(scores.values())})"
    first_max = "CASE " + " ".join(
        f"WHEN ({scores[lg]}) = best THEN '{lg}'" for lg in langs) + " END"
    return (docs
            .select("doc_id", F.expr(greatest).alias("best"),
                    *[F.expr(s).alias(f"score_{lg}")
                      for lg, s in scores.items()])
            .select("doc_id",
                    F.when(F.col("best") > 0, F.expr(
                        "CASE " + " ".join(
                            f"WHEN score_{lg} = best THEN '{lg}'"
                            for lg in langs) + " END"))
                    .otherwise(F.lit("und")).alias("lang_pred"),
                    F.col("best").alias("evidence")))


def lang_id_sql(from_clause: str, text_col: str = "text") -> str:
    """Oracle twin of :func:`lang_id` (same expression text)."""
    padded = f"(' ' || {text_col} || ' ')"
    scores = {lang: " + ".join(occurrences_sql(padded, m) for m in marks)
              for lang, marks in LANG_MARKERS.items()}
    langs = list(scores)
    greatest = f"greatest({', '.join(scores.values())})"
    whens = " ".join(f"WHEN score_{lg} = best THEN '{lg}'" for lg in langs)
    inner_cols = ", ".join(f"{s} AS score_{lg}" for lg, s in scores.items())
    return f"""SELECT doc_id,
       CASE WHEN best > 0 THEN (CASE {whens} END) ELSE 'und' END AS lang_pred,
       best AS evidence
FROM (SELECT doc_id, {greatest} AS best, {inner_cols} {from_clause}) t"""


def fingerprint_series(texts, modulus: int = (1 << 61) - 1,
                       base: int = 257):
    """Per-batch polynomial rolling hash: h = sum(byte_i * base^(n-1-i))
    mod modulus. Every intermediate stays below 2^62 (python ints here;
    the DuckDB twin uses the Mersenne split identity for the same fold,
    sql/oracle_training.doc_fingerprint_select)."""
    import numpy as np
    import pandas as pd

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts.fillna("")):
        h = 0
        for ch in t.encode("utf-8"):
            h = (h * base + ch) % modulus
        out[i] = h
    return pd.Series(out)


def fingerprint(docs: DataFrame, text_col: str = "text",
                modulus: int = (1 << 61) - 1, base: int = 257) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (61-bit Mersenne),
    vectorized per Arrow batch; hash-checked against the DuckDB
    split-identity twin in the gate."""

    @pandas_udf("long")
    def _fp(texts):
        return fingerprint_series(texts, modulus, base)

    return docs.select("doc_id", _fp(F.col(text_col)).alias("fingerprint"))
