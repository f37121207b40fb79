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

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
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


REP_SCALE = 1_000_000


def _doc_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, pos, word) — one row per whitespace token, position
    preserved so windowed n-gram/run logic can see adjacency."""
    return (docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"))
        .where(F.col("word") != ""))


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, word-level.

    Per document: token counts, duplicate-word fraction, the character
    share of the most frequent word and bigram, and the longest run of
    one word repeated consecutively. (The public Gopher/Dolma recipes
    also use duplicate-*line* fractions; on single-line corpora the
    word/bigram forms carry the signal.) Fractions are emitted as
    ``floor(x * 1e6)`` integers so the DuckDB oracle matches exactly.

    Scale: two shuffles keyed by (doc_id, word)/(doc_id, bigram) plus
    one window keyed by doc_id — every group is bounded by document
    length, so there is no hot key regardless of corpus size.
    """
    toks = _doc_tokens(docs, text_col)
    wc = toks.groupBy("doc_id", "word").agg(F.count("*").alias("cnt"))
    words = wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count("*").alias("n_distinct_words"),
        F.max("cnt").alias("top_word_cnt"))

    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (toks.withColumn("nxt", F.lead("word").over(w))
           .where(F.col("nxt").isNotNull())
           .select("doc_id",
                   F.concat_ws(" ", "word", "nxt").alias("bigram")))
    bg = (big.groupBy("doc_id", "bigram").agg(F.count("*").alias("cnt"))
          .groupBy("doc_id").agg(F.sum("cnt").alias("n_bigrams"),
                                 F.max("cnt").alias("top_bigram_cnt")))

    runs = (toks
            .withColumn("new_run",
                        F.when(F.lag("word").over(w).isNull()
                               | (F.lag("word").over(w) != F.col("word")),
                               1).otherwise(0))
            .withColumn("run_id", F.sum("new_run").over(w))
            .groupBy("doc_id", "run_id").agg(F.count("*").alias("run_len"))
            .groupBy("doc_id").agg(F.max("run_len").alias("max_word_run")))

    def frac(num, den):
        return F.floor(num * REP_SCALE / den)

    return (words.join(bg, "doc_id", "left").join(runs, "doc_id")
            .select(
                "doc_id", "n_words", "n_distinct_words",
                frac(F.col("n_words") - F.col("n_distinct_words"),
                     F.col("n_words")).alias("dup_word_frac_scaled"),
                frac(F.col("top_word_cnt"),
                     F.col("n_words")).alias("top_word_frac_scaled"),
                F.coalesce(frac(F.col("top_bigram_cnt"), F.col("n_bigrams")),
                           F.lit(0)).alias("top_bigram_frac_scaled"),
                "max_word_run"))


def tf_idf(docs: DataFrame, text_col: str = "text",
           top_k: int = 5) -> DataFrame:
    """Per-document top-k TF-IDF keywords.

    ``tfidf = tf * ln(n_docs / df)`` with the score emitted as a
    ``floor(1e6 * ...)`` integer; ``ln`` is dual-dialect-exact (the
    projection oracles already rely on it). Ties break on the term
    itself so the top-k cut is deterministic.

    Scale: tf is one (doc_id, word) shuffle; df re-aggregates the much
    smaller tf table by word; n_docs rides along as a broadcast
    1-row join (no driver collect); the final top-k is a window
    partitioned by doc_id.
    """
    tf = (_doc_tokens(docs, text_col)
          .groupBy("doc_id", "word").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    total = docs.agg(F.count("*").alias("n_docs"))
    scored = (tf.join(dfreq, "word")
              .crossJoin(F.broadcast(total))
              .select(
                  "doc_id", "word", "tf", "df",
                  F.floor(F.lit(1000000.0) * F.col("tf").cast("double")
                          * F.log(F.col("n_docs").cast("double")
                                  / F.col("df").cast("double")))
                  .alias("tfidf_scaled")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_scaled"), "word")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k))


# PII patterns restricted to the Java-regex ∩ RE2 dialect (no
# lookaround): the standard pre-training scrub set. Replacement order
# matters (emails first, so their digits never feed the phone pattern)
# and is identical in the DuckDB oracle.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\+[0-9][0-9 -]{7,}[0-9]"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone numbers, JVM-side (regexp_replace
    + regexp_count stay in codegen — no Python in the hot path).

    Output: (doc_id, scrubbed, n_email, n_ipv4, n_phone). Counts are
    taken on the raw text per pattern; replacements apply sequentially.
    """
    scrubbed = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat))
                      .cast("long").alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return docs.select("doc_id", scrubbed.alias("scrubbed"), *counts)


def fingerprint_series(texts, modulus: int = (1 << 61) - 1,
                       base: int = 257):
    """Per-batch polynomial rolling hash: h = sum(byte_i * base^(n-1-i))
    mod modulus.

    Vectorized for the default (61-bit Mersenne, base 257): documents
    are LEFT-padded with zero bytes into one matrix (leading zeros do
    not change a polynomial hash) and the fold runs per byte position
    over the whole batch. ``h*257`` would overflow int64, so each step
    splits ``h = h1*2^32 + h0`` and reduces ``h1*257*2^32`` with the
    Mersenne identity ``2^61 === 1 (mod M)`` — every intermediate stays
    below 2^62. The DuckDB twin applies the identical split
    (sql/oracle_training.doc_fingerprint_select). Non-default
    modulus/base falls back to the exact python-int loop.
    """
    import numpy as np
    import pandas as pd

    if modulus != (1 << 61) - 1 or base >= (1 << 8):
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("")):
            h = 0
            for ch in t.encode("utf-8"):
                h = (h * base + ch) % modulus
            out[i] = h
        return pd.Series(out)

    bs = [t.encode("utf-8") for t in texts.fillna("")]
    if not bs:
        return pd.Series(np.empty(0, dtype=np.int64))
    width = max(len(b) for b in bs) or 1
    m = np.zeros((len(bs), width), dtype=np.uint8)
    for i, b in enumerate(bs):
        if b:
            m[i, width - len(b):] = np.frombuffer(b, dtype=np.uint8)
    M = modulus
    mask29 = (1 << 29) - 1
    mask32 = (1 << 32) - 1
    h = np.zeros(len(bs), dtype=np.int64)
    for j in range(width):
        h1 = h >> 32                      # < 2^29
        h0 = h & mask32                   # < 2^32
        x = h1 * base                     # < 2^38
        # x * 2^32 mod M via 2^61 === 1: high 29 bits wrap to the bottom
        hi = (x >> 29) + ((x & mask29) << 32)       # < 2^61 + 2^9
        y = hi + h0 * base + m[:, j]                # < 2^62: int64-safe
        y = (y >> 61) + (y & M)
        y = (y >> 61) + (y & M)
        h = np.where(y >= M, y - M, y)
    return pd.Series(h)


def fingerprint(docs: DataFrame, text_col: str = "text",
                modulus: int = (1 << 61) - 1, base: int = 257) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (61-bit Mersenne),
    vectorized per Arrow batch; hash-checked against the DuckDB
    split-identity twin in the gate."""

    @pandas_udf("long")
    def _fp(texts):
        return fingerprint_series(texts, modulus, base)

    return docs.select("doc_id", _fp(F.col(text_col)).alias("fingerprint"))


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text normalization — the first stage of every
    curation pipeline, as pure codegen Columns: lowercase, control
    characters to spaces, whitespace runs collapsed, ends trimmed.
    The regex family ([\\x00-\\x1F\\x7F], \\s+) parses identically in
    Java regex and RE2, so the DuckDB oracle matches bitwise.

    Output: (doc_id, norm_text, n_chars_raw, n_chars_norm).
    """
    norm = F.trim(F.regexp_replace(F.regexp_replace(
        F.lower(F.col(text_col)), "[\\x00-\\x1F\\x7F]", " "),
        "\\s+", " "))
    return docs.select(
        "doc_id", norm.alias("norm_text"),
        F.length(text_col).cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"))


def winnow_fingerprints(docs: DataFrame, text_col: str = "text",
                        shingle_k: int = 3, window: int = 4) -> DataFrame:
    """MOSS winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): from each document's positional ``shingle_k``-gram
    hash sequence, select the minimum hash of every ``window``
    consecutive grams (rightmost on ties) — the guarantee is that any
    shared substring of >= ``window + shingle_k - 1`` tokens yields at
    least one IDENTICAL selected (hash) on both sides, with ~2/(w+1)
    of positions kept. The standard robust local-similarity
    fingerprint for plagiarism/boilerplate detection, denser than one
    whole-doc hash and far sparser than every gram.

    Engine shape — all codegen, no Python: token hashes are the
    pure-Column 31-bit polynomial (``similarity.token_hash_col``,
    oracle-identical), gram hashes the same windowed fold minhash
    uses, and the window-min rides ONE per-document window frame
    (``ROWS 0..window-1``) over an int64-packed (hash, reversed-pos)
    key — ``gh * 2^20 + (2^20-1-pos)`` — so "min hash, ties to
    RIGHTMOST position" is a plain ``min()``. Positions are bounded
    by 2^20 tokens/doc (docs beyond that should be chunked first).
    Per-doc partitions keep the sort document-bounded, exactly like
    :func:`maps_spark.operators.dedup.dup_spans`.

    Output: (doc_id, pos, gram_hash) — distinct selected grams,
    ``pos`` the 0-based gram start in the space-split token sequence.
    """
    from pyspark.sql import Window

    from maps_spark.operators.dedup import P31, SHINGLE_BASE
    from maps_spark.operators.similarity import token_hash_col

    POSCAP = 1 << 20
    hs = F.transform(F.split(F.col(text_col), " "), token_hash_col)
    starts = F.when(
        F.size(hs) >= shingle_k,
        F.sequence(F.lit(0), F.size(hs) - shingle_k)
    ).otherwise(F.array().cast("array<int>"))
    grams = (docs.select("doc_id", hs.alias("hs"), starts.alias("ii"))
             .select("doc_id", "hs", F.explode("ii").alias("i"))
             # the packed key reserves 20 bits for the reversed
             # position; beyond that it would borrow from the hash
             # field and select garbage, so positions past 2^20
             # truncate EXPLICITLY (chunk monster docs upstream)
             .where(F.col("i") < POSCAP)
             .select(
                 "doc_id", "i",
                 F.aggregate(
                     F.slice("hs", F.col("i") + 1, F.lit(shingle_k)),
                     F.lit(0).cast("long"),
                     lambda acc, h: (acc * SHINGLE_BASE + h) % P31)
                 .alias("gh")))
    key = (F.col("gh") * POSCAP + (POSCAP - 1 - F.col("i"))).alias("key")
    wdoc = Window.partitionBy("doc_id")
    wmin = wdoc.orderBy("i").rowsBetween(0, window - 1)
    keyed = grams.select(
        "doc_id", "i", key,
        F.count("*").over(wdoc).alias("ng"))
    mins = keyed.select(
        "doc_id", "i", "ng",
        F.min("key").over(wmin).alias("mk"))
    return (mins
            .where(F.col("i") <= F.greatest(F.col("ng") - window,
                                            F.lit(0)))
            .select("doc_id",
                    (POSCAP - 1 - F.pmod("mk", F.lit(POSCAP)))
                    .cast("int").alias("pos"),
                    F.expr(f"mk div {POSCAP}").cast("long")
                    .alias("gram_hash"))
            .distinct())


def winnow_pairs(docs: DataFrame, text_col: str = "text",
                 shingle_k: int = 3, window: int = 4,
                 min_shared: int = 2, max_df: int = 1000) -> DataFrame:
    """Local-overlap candidate pairs from winnowing fingerprints — the
    apply-side of :func:`winnow_fingerprints` (MOSS's match step):
    documents sharing >= ``min_shared`` selected gram hashes, with the
    shared count as the overlap signal. Catches partial plagiarism /
    quoted passages that whole-document hashes miss and symmetric
    Jaccard underweights.

    Scale shape: the join key is the selected-hash table (~2/(w+1) of
    gram positions), hashes appearing in more than ``max_df``
    documents are dropped before the self-join (the same hot-shingle
    boilerplate guard as ``ngram_jaccard_pairs`` — a corpus-wide
    boilerplate fingerprint would otherwise explode quadratically),
    and the pair count is a map-side-combinable aggregation.

    Output: (doc_a, doc_b, n_shared) with doc_a < doc_b.
    """
    from maps_spark.operators.dedup import _bucket_member_pairs
    fps = (winnow_fingerprints(docs, text_col, shingle_k, window)
           .select("doc_id", "gram_hash").distinct())
    # one collect-members aggregation instead of {df agg + broadcast
    # anti-join + two-sided self-join} — see dedup.
    # _bucket_member_pairs; the df cap predicate (count > max_df drops
    # the bucket) and the per-pair shared counts are identical
    return (_bucket_member_pairs(fps, ["gram_hash"], max_df)
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_shared"))
            .where(F.col("n_shared") >= min_shared))


def compression_signals(docs: DataFrame, text_col: str = "text",
                        level: int = 6,
                        scale: int = 1_000_000) -> DataFrame:
    """zlib compression ratio per document — the classic
    repetitiveness signal from the public corpus-quality literature
    (boilerplate, keyword stuffing, and templated spam compress far
    better than natural prose; deflate's LZ77 window catches
    repetition structures the word-level n-gram heuristics in
    :func:`repetition_signals` miss). One Arrow-batched pandas UDF —
    zlib runs at C speed over utf-8 bytes, no per-row Python beyond
    the compress call.

    Deterministic for a fixed zlib version+level, but NOT
    oracle-expressible (no deflate in the SQL twin), so the gate is
    rows-only and correctness pins via pytest invariants (ordering
    between planted repetitive/diverse texts, exact byte accounting).

    Output: (doc_id, n_bytes, n_compressed, ratio_scaled) with
    ratio = floor(n_compressed * scale / n_bytes); empty docs report
    ratio 0.
    """
    import zlib

    @pandas_udf("array<long>")
    def _sizes(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna(""):
            b = t.encode("utf-8")
            out.append(np.array([len(b), len(zlib.compress(b, level))],
                                dtype=np.int64))
        return pd.Series(out)

    s = docs.select("doc_id", _sizes(F.col(text_col)).alias("s"))
    return (s.select(
        "doc_id", F.element_at("s", 1).alias("n_bytes"),
        F.element_at("s", 2).alias("n_compressed"))
        .select("doc_id", "n_bytes", "n_compressed",
                F.when(F.col("n_bytes") > 0,
                       F.expr(f"(n_compressed * {scale}) div n_bytes"))
                .otherwise(F.lit(0)).cast("long")
                .alias("ratio_scaled")))


def lz_complexity(docs: DataFrame, text_col: str = "text",
                  scale: int = 1_000_000) -> DataFrame:
    """Lempel-Ziv complexity per document — the phrase count of the
    LZ78 incremental parse (Lempel & Ziv 1976/1978): repetitive or
    templated text parses into FEW phrases, diverse prose into many.
    The oracle-hashable sibling of :func:`compression_signals`:
    deflate needs zlib (rows-only gate), but the LZ78 parse is pure
    integer/string logic the DuckDB twin replays exactly as a
    recursive CTE (the parse dictionary is prefix-closed, so each
    next phrase is the longest dictionary prefix of the remainder
    plus one character; a trailing already-known phrase counts).

    One Arrow-batched pandas UDF, amortized O(chars) per doc via the
    hash-set parse. Output: (doc_id, n_chars, n_phrases,
    density_scaled) with density = floor(n_phrases * scale /
    n_chars); empty docs report 0."""
    @pandas_udf("array<long>")
    def _parse(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna(""):
            seen: set[str] = set()
            n = 0
            cur = ""
            for ch in t:
                cur += ch
                if cur not in seen:
                    seen.add(cur)
                    n += 1
                    cur = ""
            if cur:  # text ends inside a known phrase
                n += 1
            out.append(np.array([len(t), n], dtype=np.int64))
        return pd.Series(out)

    s = docs.select("doc_id", _parse(F.col(text_col)).alias("s"))
    return (s.select(
        "doc_id", F.element_at("s", 1).alias("n_chars"),
        F.element_at("s", 2).alias("n_phrases"))
        .select("doc_id", "n_chars", "n_phrases",
                F.when(F.col("n_chars") > 0,
                       F.expr(f"(n_phrases * {scale}) div n_chars"))
                .otherwise(F.lit(0)).cast("long")
                .alias("density_scaled")))


def quality_ensemble(signals: DataFrame, weights: dict[str, int],
                     group_col: str = "source",
                     id_col: str = "doc_id") -> DataFrame:
    """Rank-normalized quality ensemble — the standard way to combine
    heterogeneous quality signals (length, stopword density,
    repetition, compression ratio, classifier scores) into ONE
    comparable keep/rank score: each signal maps to its within-group
    ``percent_rank`` (so a 6-order-of-magnitude byte count and a
    [0,1] ratio contribute on the same footing, and per-source
    normalization stops one crawl's distribution from drowning
    another's), then the weighted sum scores the document. Positive
    weight = larger is better; negative = larger is worse.

    Determinism/oracle parity: ``percent_rank`` is (rank-1)/(n-1)
    with ties sharing a rank — order-free and IEEE-identical across
    engines; terms sum in sorted(column) order on both sides. Groups
    partition the windows, so the sort is per-source, never global.

    Output: (id_col, group_col, score_scaled) with
    score = floor(sum_i w_i * pr_i) — weights are the integer scale.
    """
    score = None
    for c in sorted(weights):
        pr = F.percent_rank().over(
            Window.partitionBy(group_col).orderBy(c))
        term = pr * F.lit(int(weights[c]))
        score = term if score is None else score + term
    return signals.select(
        id_col, group_col,
        F.floor(score).cast("long").alias("score_scaled"))


def winnow_contamination(docs: DataFrame, benchmark: DataFrame,
                         text_col: str = "text", shingle_k: int = 3,
                         window: int = 4,
                         scale: int = 1_000_000) -> DataFrame:
    """Benchmark decontamination via winnowing fingerprints — the
    scale path beside :func:`maps_spark.operators.corpus
    .contamination_check` (which probes EVERY distinct shingle): here
    both sides reduce to their winnowed selections first (~2/(w+1) of
    gram positions), and the winnowing guarantee still catches any
    verbatim benchmark run of >= window + k - 1 tokens — the
    contamination that matters. The benchmark fingerprint set is
    distinct-small and broadcast, so the probe is a map-side hash
    join; the corpus side never shuffles its explode.

    Output: (doc_id, n_fingerprints, n_contaminated,
    contamination_scaled) with the ratio integer-scaled; documents
    too short to produce a gram report zero fingerprints.
    """
    doc_fp = (winnow_fingerprints(docs, text_col, shingle_k, window)
              .select("doc_id", "gram_hash"))
    bench_fp = (winnow_fingerprints(benchmark, text_col, shingle_k,
                                    window)
                .select("gram_hash").distinct())
    probed = doc_fp.join(F.broadcast(bench_fp.withColumn(
        "hit", F.lit(1))), "gram_hash", "left")
    per_doc = (probed.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_fingerprints"),
                    F.count("hit").alias("n_contaminated")))
    all_docs = docs.select("doc_id")
    return (all_docs.join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_fingerprints", F.lit(0)).cast("long")
                    .alias("n_fingerprints"),
                    F.coalesce("n_contaminated", F.lit(0)).cast("long")
                    .alias("n_contaminated"))
            .select("doc_id", "n_fingerprints", "n_contaminated",
                    F.when(F.col("n_fingerprints") > 0,
                           F.expr(f"(n_contaminated * {scale}) "
                                  "div n_fingerprints"))
                    .otherwise(F.lit(0)).cast("long")
                    .alias("contamination_scaled")))


# --------------------------------------------------------------------------
# Sentence segmentation + readability. The synthetic documents carry
# no punctuation, so the gates run over synthesize_prose — a
# deterministic re-punctuation (period after every 4 + doc_id % 5
# words), the same synthesize-then-extract discipline the HTML
# family uses.
# --------------------------------------------------------------------------

SENT_SPLIT_RE = r"[.!?]+ +"   # RE2- and Java-identical, no lookbehind
VOWEL_RE = r"[aeiouy]+"


def synthesize_prose(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Replace ``text`` with a punctuated form: sentences of
    ``4 + doc_id % 5`` words joined by '. ', final period included.
    Pure codegen; the splitter inverse is pinned in tests."""
    w = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    slen = (F.col(id_col) % 5 + 4).cast("long")
    nsent = (F.floor((F.greatest(F.size(w), F.lit(1)) - 1)
                     / slen.cast("double")).cast("long") + 1)
    sents = F.transform(
        F.sequence(F.lit(0).cast("long"), nsent - 1),
        lambda i: F.concat(
            F.array_join(F.slice(w, i * slen + 1, slen), " "),
            F.lit(".")))
    return docs.withColumn(text_col, F.array_join(sents, " "))


def sentence_split(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """One row per sentence: (id, sent_idx, sentence, n_words,
    n_chars). The boundary is a punctuation run followed by spaces
    (terminal punctuation is stripped from the sentence text);
    empty fragments drop on both engines, so Spark's trailing-empty
    split convention never leaks. Pure codegen explode — no
    shuffle."""
    parts = F.split(F.col(text_col), SENT_SPLIT_RE)
    ex = docs.select(
        F.col(id_col),
        F.posexplode(parts).alias("sent_idx", "raw"))
    s = F.regexp_replace(F.trim(F.col("raw")), r"[.!?]+$", "")
    return (ex.select(
        id_col, F.col("sent_idx").cast("long"), s.alias("sentence"))
        .where(F.col("sentence") != "")
        .withColumn("n_words",
                    F.size(F.filter(F.split("sentence", " "),
                                    lambda x: x != "")).cast("long"))
        .withColumn("n_chars", F.length("sentence").cast("long")))


def readability(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Flesch reading ease as exact integer milli-points:
    ``206835 - (1015 * W) div S - (84600 * Y) div W`` where W =
    whitespace tokens, S = sentence-ending punctuation runs (min 1),
    and Y = syllables approximated as vowel-group runs per word
    (min 1 per word — the standard dependency-free estimator). No
    floats anywhere, so the gate hash-checks bitwise; ordering
    matches the float formula. Pure per-row codegen.

    Output: (id, n_words, n_sentences, n_syllables, fre_milli)."""
    w = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    syl = F.aggregate(
        F.transform(w, lambda t: F.greatest(
            F.size(F.regexp_extract_all(t, F.lit(VOWEL_RE), F.lit(0))),
            F.lit(1)).cast("long")),
        F.lit(0).cast("long"), lambda a, x: a + x)
    nw = F.greatest(F.size(w), F.lit(1)).cast("long")
    ns = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    return docs.select(
        F.col(id_col),
        nw.alias("n_words"), ns.alias("n_sentences"),
        syl.alias("n_syllables")
    ).withColumn(
        "fre_milli",
        F.expr("206835 - (1015 * n_words) div n_sentences "
               "- (84600 * n_syllables) div n_words").cast("long"))
