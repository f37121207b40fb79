"""Corpus-level training-data operators: benchmark decontamination and
deterministic sampling.

Both are standard steps between "raw documents" and "training set":

- :func:`contamination_check` measures per-document n-gram overlap
  against an evaluation-benchmark set so contaminated documents can be
  dropped before training (the step every serious pretraining pipeline
  runs against its eval suites).
- :func:`stratified_sample` / :func:`hash_sample` draw reproducible
  samples with NO RNG state: membership is a pure function of doc_id,
  so the same call yields the same sample on any cluster, any engine,
  any day — which is what makes train/val splits auditable.

Scale notes: the benchmark shingle set is broadcast (benchmarks are
small by construction — MMLU-sized suites are a few hundred thousand
shingles); the per-document explode/agg is one shuffle keyed by
doc_id; the samplers are pure Column arithmetic inside codegen — no
shuffle at all for :func:`hash_sample`, one window shuffle per stratum
for :func:`stratified_sample`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from maps_spark.operators.dedup import P31, _shingle_array

# two-round 31-bit multiplicative mixer constants (seeded once, shared
# with the DuckDB oracle; any odd multipliers < 2^31-1 work)
HASH_A, HASH_B = 1103515245, 12345
HASH_C, HASH_D = 69069, 362437

SCALE = 1_000_000


def _mix(col) -> F.Column:
    """Deterministic uniform-ish value in [0, 2^31-1): two rounds of
    (x*a + b) mod p. Products < 2^62 — int64-exact, so the identical
    expression runs in DuckDB SQL (BIGINT) and matches bitwise."""
    r1 = (col.cast("long") * HASH_A + HASH_B) % P31
    return (r1 * HASH_C + HASH_D) % P31


def mix_sql(expr: str) -> str:
    """DuckDB twin of :func:`_mix` (same constants, same fold)."""
    return (f"(((CAST({expr} AS BIGINT) * {HASH_A} + {HASH_B}) % {P31})"
            f" * {HASH_C} + {HASH_D}) % {P31}")


def contamination_check(docs: DataFrame, benchmark: DataFrame,
                        shingle_k: int = 3, text_col: str = "text",
                        threshold: float = 0.2) -> DataFrame:
    """Per-document benchmark contamination: the fraction of a doc's
    distinct k-token shingles that also occur in the benchmark set.

    The benchmark shingle set is deduplicated and broadcast — the
    contamination join is therefore a map-side hash probe per shingle,
    no shuffle of the corpus explode. Output per corpus document:
    (doc_id, n_shingles, n_contaminated, contamination_scaled, flagged)
    where contamination_scaled = floor(n_contaminated * 1e6 /
    n_shingles) — exact integer, oracle-safe.
    """
    bench_sh = (benchmark
                .select(F.explode(F.array_distinct(
                    _shingle_array(text_col, shingle_k))).alias("shingle"))
                .distinct())
    # materialized once: the shingle transform is an interpreted
    # higher-order function and feeds two consumers (hits + sizes).
    # Eager + non-reliable barrier, deliberately — see the trade-off
    # note in operators.dedup.ngram_jaccard_pairs (cluster deployments
    # use staged-table writes instead)
    doc_sh = docs.select(
        "doc_id", F.explode(F.array_distinct(
            _shingle_array(text_col, shingle_k))).alias("shingle")
    ).localCheckpoint()
    hits = (doc_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
            .groupBy("doc_id").agg(F.count("*").alias("n_contaminated")))
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    ratio = F.floor(F.col("n_contaminated") * SCALE
                    / F.col("n_shingles")).cast("long")
    return (sizes.join(hits, "doc_id", "left")
            .withColumn("n_contaminated",
                        F.coalesce("n_contaminated", F.lit(0)))
            .select("doc_id", "n_shingles", "n_contaminated",
                    ratio.alias("contamination_scaled"),
                    (ratio >= int(threshold * SCALE)).alias("flagged")))


def top_ngrams(docs: DataFrame, n: int = 2, k: int = 50,
               text_col: str = "text") -> DataFrame:
    """Corpus-level top-k word n-grams: (ngram, n_occ, n_docs).

    The workhorse behind boilerplate detection and contamination
    triage — which phrases dominate the corpus, and how widely.
    Deterministic: ties at the cutoff break on the ngram string.

    Scale: one (ngram) shuffle with map-side partial aggregation; the
    distinct-doc count re-shuffles (ngram, doc_id) pairs once. Hot
    n-grams are safe — both stages are pure aggregation, and the
    final top-k is a ``TakeOrdered`` (no global sort materializes).
    """
    from maps_spark.operators.text import _doc_tokens
    toks = _doc_tokens(docs, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.col("word")
    for i in range(1, n):
        gram = F.concat_ws(" ", gram, F.lead("word", i).over(w))
    # gram and the null-guard must be projected BEFORE the filter: a
    # window evaluated after .where would see the truncated token set
    grams = (toks.select("doc_id", gram.alias("ngram"),
                         F.lead("word", n - 1).over(w).alias("last"))
             .where(F.col("last").isNotNull())
             .select("doc_id", "ngram"))
    counts = grams.groupBy("ngram").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"))
    return counts.orderBy(F.desc("n_occ"), "ngram").limit(k)


def build_vocab(docs: DataFrame, text_col: str = "text",
                min_count: int = 1) -> DataFrame:
    """Frequency-ranked vocabulary: (word, n_occ, n_docs, token_id) with
    dense ids 0..V-1 assigned by (n_occ desc, word) — the tokenizer-prep
    step of a training pipeline, deterministic across engines.

    Scale: the (word) aggregation is one shuffle with map-side combine;
    id assignment uses a distributed sort + ``zipWithIndex`` (same
    pattern as ``pyramid.dictionary_encode``) so no single-partition
    window materializes the vocabulary in one task.
    """
    from maps_spark.operators.text import _doc_tokens
    toks = _doc_tokens(docs, text_col)
    counts = (toks.groupBy("word").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_occ") >= min_count))
    spark = docs.sparkSession
    ranked = counts.sort(F.desc("n_occ"), "word")
    return spark.createDataFrame(
        ranked.rdd.map(tuple).zipWithIndex()
        .map(lambda kv: kv[0] + (kv[1],)),
        "word string, n_occ long, n_docs long, token_id long")


def lm_score(docs: DataFrame, text_col: str = "text",
             scale: int = SCALE) -> DataFrame:
    """Per-document negative log-likelihood under a corpus-trained
    bigram language model with add-one smoothing — the classic
    KenLM-style quality signal: boilerplate and fluent text score low
    NLL, gibberish and OCR noise score high.

    P(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V) where c(w1,·) counts
    bigrams headed by w1 and V is the corpus vocabulary size. Each
    bigram's log-prob is floored to an integer at ``scale`` before the
    per-document sum, so the aggregate is exact integer math in any
    sum order — engine-independent (oracle-safe).

    Scale: two aggregations keyed by (w1, w2) and (w1) with map-side
    combine, one scalar (V) broadcast, one (w1, w2) equi-join back to
    the exploded corpus — every stage shuffles on a key whose
    cardinality is bounded by the vocabulary, not the corpus.

    Output: (doc_id, n_bigrams, nll_scaled, avg_nll_scaled).
    """
    from maps_spark.operators.text import _doc_tokens
    toks = _doc_tokens(docs, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (toks.select("doc_id", F.col("word").alias("w1"),
                       F.lead("word").over(w).alias("w2"))
           .where(F.col("w2").isNotNull()))
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    c1 = c2.groupBy("w1").agg(F.sum("cnt").alias("head"))
    v = toks.agg(F.countDistinct("word").alias("v"))
    lp = (c2.join(c1, "w1").crossJoin(F.broadcast(v))
          .select("w1", "w2",
                  F.floor(F.lit(float(scale)) * F.log(
                      (F.col("cnt") + 1).cast("double")
                      / (F.col("head") + F.col("v")).cast("double")))
                  .cast("long").alias("lp")))
    return (big.join(lp, ["w1", "w2"])
            .groupBy("doc_id").agg(
                F.count("*").alias("n_bigrams"),
                (-F.sum("lp")).cast("long").alias("nll_scaled"))
            # nll is positive, so integer `div` == floor division ==
            # DuckDB's `//` — exact at any magnitude (no double round-trip)
            .withColumn("avg_nll_scaled",
                        F.expr("nll_scaled div n_bigrams"))
            .select("doc_id", "n_bigrams", "nll_scaled",
                    "avg_nll_scaled"))


def source_stats(docs: DataFrame, keep_threshold: float = 0.5,
                 scale: int = SCALE) -> DataFrame:
    """Per-source (domain-reputation-style) quality aggregation: how
    many documents each source contributes, how many pass the quality
    filter, and whether the source clears ``keep_threshold`` keep-rate
    — the corpus-curation step that drops whole low-quality domains
    rather than re-scoring every page (RefinedWeb/C4 pattern).

    One doc_id equi-join (quality scores back to sources) and one
    (source) aggregation with map-side combine; source cardinality is
    tiny next to the corpus, so the final agg is never the bottleneck.

    Output: (source, n_docs, n_tokens, n_kept, keep_rate_scaled,
    reputable).
    """
    from maps_spark.operators.text import quality_score
    q = quality_score(docs)
    j = docs.select("doc_id", "source").join(q, "doc_id")
    rate = F.floor(F.col("n_kept") * scale / F.col("n_docs")).cast("long")
    return (j.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"))
        .select("source", "n_docs", "n_tokens", "n_kept",
                rate.alias("keep_rate_scaled"),
                (rate >= int(keep_threshold * scale)).alias("reputable")))


def source_divergence(docs: DataFrame, text_col: str = "text",
                      group_col: str = "source",
                      vocab_k: int = 200) -> DataFrame:
    """Token-distribution shift per source: total-variation distance
    between each source's token distribution and the whole corpus,
    restricted to the corpus's top-``vocab_k`` tokens — the curation
    signal for "this domain's language is drifting from the mix"
    (de-weighting / mixture-rebalance input).

    TV over the shared vocab is kept INTEGER-exact for cross-engine
    reproducibility: with per-token counts c_s (source) and c_c
    (corpus) and totals N_s / N_c over the vocab,

        TV = sum_t |c_s,t * N_c - c_c,t * N_s|  /  (2 * N_s * N_c)

    and the output carries the numerator/denominator as exact BIGINTs
    (no float division crosses an engine boundary). Vocab tokens a
    source never uses still contribute (c_s = 0) via the
    vocab x source cross join — both sides are tiny (k x #sources).

    Scale: one token aggregation with map-side combine for the corpus
    counts, one for the (source, token) counts semi-joined to the
    broadcast vocab; the cross join is k x #sources rows. Counts at
    extreme scale can overflow the int64 products — cap vocab_k /
    pre-scale counts before calling if N_c * max(c) nears 2^63.

    Output: (source, n_tokens_vocab, tv_num, tv_denom), one row per
    source value.
    """
    toks = docs.select(
        F.col(group_col).alias("src"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"))
    corpus = (toks.groupBy("word").agg(F.count("*").alias("c_c"))
              .orderBy(F.desc("c_c"), "word").limit(vocab_k))
    per_src = (toks.join(F.broadcast(corpus.select("word")), "word",
                         "left_semi")
               .groupBy("src", "word").agg(F.count("*").alias("c_s")))
    totals = per_src.groupBy("src").agg(F.sum("c_s").alias("n_s"))
    n_c = corpus.agg(F.sum("c_c").alias("n_c"))
    grid = (corpus.crossJoin(F.broadcast(totals))
            .join(per_src, ["src", "word"], "left")
            .na.fill({"c_s": 0})
            .crossJoin(F.broadcast(n_c)))
    return (grid.groupBy("src", "n_s", "n_c")
            .agg(F.sum(F.abs(F.col("c_s") * F.col("n_c") -
                             F.col("c_c") * F.col("n_s")))
                 .alias("tv_num"))
            .select(F.col("src").alias(group_col),
                    F.col("n_s").alias("n_tokens_vocab"),
                    F.col("tv_num"),
                    (F.lit(2) * F.col("n_s") * F.col("n_c"))
                    .alias("tv_denom")))


def curate_corpus(docs: DataFrame, text_col: str = "text",
                  hasher: str = "fast") -> DataFrame:
    """End-to-end curation pipeline: tag every document with the first
    stage that drops it, composing the engine's own operators in the
    order every production pretraining pipeline runs them —

    1. ``quality`` — fails :func:`maps_spark.operators.text.
       quality_score` (length / token-shape / stopword gates);
    2. ``exact_dup`` — identical text to a surviving lower doc_id;
    3. ``near_dup`` — non-canonical member of a minhash-LSH cluster
       (:func:`maps_spark.operators.dedup.minhash_lsh_pairs` ->
       :func:`maps_spark.operators.dedup.dedup_clusters`) among the
       remaining docs;
    4. ``kept`` — survives all three.

    Later stages only see earlier survivors (dedup never resurrects a
    quality-dropped doc, near-dedup never re-scores exact dupes), so
    stage counts are directly the pipeline's funnel metrics.

    Scale: quality is pure codegen; exact dedup is one (text)
    aggregation — hash-partitioned, hot texts collapse map-side; the
    minhash stage inherits the capped-bucket LSH design. Output:
    (doc_id, stage).
    """
    from maps_spark.operators.dedup import (dedup_clusters,
                                            minhash_lsh_pairs)
    from maps_spark.operators.text import quality_score
    q = quality_score(docs).select("doc_id", "keep")
    d = docs.select("doc_id", text_col).join(q, "doc_id")
    quality_failed = d.where(~F.col("keep")).select("doc_id")
    # exact dedup on md5(text), not a Window over the raw text: the
    # group-agg combines map-side (a 10M-copy boilerplate text never
    # lands in one task, unlike Window.partitionBy) and the join
    # shuffles 16-byte digests instead of whole documents; AQE skew
    # splitting covers the hot digest on the join side
    s1 = d.where(F.col("keep")).withColumn("th", F.md5(F.col(text_col)))
    keepers = s1.groupBy("th").agg(F.min("doc_id").alias("keeper"))
    s1 = s1.join(keepers, "th")
    exact_dropped = (s1.where(F.col("doc_id") != F.col("keeper"))
                     .select("doc_id"))
    s2 = (s1.where(F.col("doc_id") == F.col("keeper"))
          .select("doc_id", text_col))
    clus = dedup_clusters(minhash_lsh_pairs(s2, text_col=text_col,
                                            hasher=hasher))
    near_dropped = clus.where(~F.col("keep")).select("doc_id")
    tagged = (quality_failed.withColumn("stage", F.lit("quality"))
              .unionByName(exact_dropped.withColumn(
                  "stage", F.lit("exact_dup")))
              .unionByName(near_dropped.withColumn(
                  "stage", F.lit("near_dup"))))
    return (docs.select("doc_id").join(tagged, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("stage", F.lit("kept")).alias("stage")))


def tokenize_docs(docs: DataFrame, vocab: DataFrame,
                  text_col: str = "text", unk_id: int = -1) -> DataFrame:
    """Apply a :func:`build_vocab` vocabulary to the corpus: every word
    becomes its dense token id (OOV -> ``unk_id``), emitted as a
    comma-joined string in document order — the id stream a training
    loader consumes, and the step that closes the tokenizer loop
    (vocab -> ids -> :func:`maps_spark.operators.packing.pack_sequences`).

    The id stream is a STRING (not array) so the cross-engine value
    hash is textual and exact. Documents with no tokens (empty text)
    produce no row, matching the exploded-word grouping on both engines.

    Scale: one (word) equi-join of the exploded corpus against the
    vocabulary — the vocab is orders of magnitude smaller than the
    corpus (broadcast under the session threshold, AQE otherwise) —
    and one (doc_id) aggregation whose groups are bounded by document
    length. The in-order reassembly is ``array_sort`` over
    (pos, id) structs inside codegen, never a window over the corpus.

    Output: (doc_id, n_tokens, n_oov, token_ids).
    """
    from maps_spark.operators.text import _doc_tokens
    toks = _doc_tokens(docs, text_col)
    j = toks.join(vocab.select("word", "token_id"), "word", "left")
    tid = F.coalesce(F.col("token_id"), F.lit(unk_id)).cast("long")
    agg = j.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.col("token_id").isNull().cast("long")).alias("n_oov"),
        F.array_sort(F.collect_list(F.struct(F.col("pos"), tid.alias("t"))))
        .alias("arr"))
    return agg.select(
        "doc_id", "n_tokens", "n_oov",
        F.concat_ws(",", F.transform("arr", lambda s: s["t"].cast("string")))
        .alias("token_ids"))


def corpus_profile(docs: DataFrame, value_col: str = "n_chars",
                   group_col: str = "source") -> DataFrame:
    """Per-group exact distribution profile of a numeric column — the
    corpus-audit step before curation thresholds are chosen (what does
    "short" mean per source?).

    Quantiles are EXACT (``percentile`` — sort-based rank
    interpolation, the same p*(n-1) linear rule DuckDB's
    ``quantile_cont`` uses on the same int64 operands, so the doubles
    match bitwise); at 100 TB the per-group sort is bounded by the
    group's row count and groups are independent — for corpus-sized
    groups switch to ``percentile_approx`` and a rows-only check.

    Output: (group, n_docs, min_v, max_v, sum_v, p25, p50, p75, p90).
    """
    v = F.col(value_col).cast("long")
    return (docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v).alias("sum_v"),
        F.percentile(v, F.lit(0.25)).alias("p25"),
        F.percentile(v, F.lit(0.5)).alias("p50"),
        F.percentile(v, F.lit(0.75)).alias("p75"),
        F.percentile(v, F.lit(0.9)).alias("p90")))


def corpus_diff(old: DataFrame, new: DataFrame,
                text_col: str = "text") -> DataFrame:
    """Snapshot-to-snapshot corpus diff: which documents were added,
    removed, or changed between two corpus versions — the trigger set
    for incremental re-curation (only the diff re-enters the dedup /
    quality / tokenize pipeline, cf. :mod:`maps_spark.streaming.dedup`).

    One full outer join of 16-byte text digests keyed by doc_id; with
    both snapshots in a :mod:`maps_spark.sources.doc_store` bucketed
    store the join is co-partitioned and shuffle-free. Unchanged
    documents (the overwhelming majority at 100 TB) are dropped before
    any downstream work.

    Output: (doc_id, change) with change in {added, removed, changed}.
    """
    o = old.select("doc_id", F.md5(F.col(text_col)).alias("h_old"))
    n = new.select("doc_id", F.md5(F.col(text_col)).alias("h_new"))
    change = (F.when(F.col("h_old").isNull(), F.lit("added"))
              .when(F.col("h_new").isNull(), F.lit("removed"))
              .when(F.col("h_old") != F.col("h_new"), F.lit("changed")))
    return (o.join(n, "doc_id", "full")
            .select("doc_id", change.alias("change"))
            .where(F.col("change").isNotNull()))


def hash_sample(docs: DataFrame, rate: float,
                id_col: str = "doc_id") -> DataFrame:
    """Keep ~``rate`` of documents by deterministic id hash — a pure
    filter (no shuffle, no RNG): kept iff mix(doc_id) < rate * (2^31-1).
    Reproducible across runs and engines; disjoint rate bands give
    disjoint splits (e.g. train = [0, .98), val = [.98, 1))."""
    return docs.where(_mix(F.col(id_col)) < int(rate * P31))


def stratified_sample(docs: DataFrame, strata_col: str = "lang",
                      n_per_stratum: int = 20,
                      id_col: str = "doc_id") -> DataFrame:
    """Exactly ``n_per_stratum`` docs per stratum (fewer if the stratum
    is smaller), chosen by ranking the deterministic id hash within
    each stratum — an order-statistics sample that is reproducible and
    engine-independent. One shuffle (the per-stratum window); at 100 TB
    with few strata, salt the window key or pre-filter with
    ``hash_sample`` at a few× the target rate first so each stratum's
    sort stays in one executor's memory.

    Output: (doc_id, stratum, sample_rank).
    """
    h = _mix(F.col(id_col))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(strata_col).alias("stratum"),
                        F.row_number().over(w).alias("sample_rank"))
            .where(F.col("sample_rank") <= n_per_stratum))


def domain_cap(docs: DataFrame, cap: int,
               domain_col: str = "source",
               order_col: str = "doc_id") -> DataFrame:
    """Cap documents per domain (the standard web-corpus guard against
    a handful of megadomains dominating the mix): keep at most ``cap``
    docs per ``domain_col``, lowest ``order_col`` first — fully
    deterministic.

    Skew shape: the naive form is one window over EVERY domain, which
    sorts the whole corpus. Since most domains are under the cap, this
    splits adaptively (the same count-then-choose plan split as
    ``dedup_clusters``): a domain-count aggregate finds the over-cap
    domains (a tiny table — broadcast), under-cap domains pass through
    WITHOUT sorting, and only the over-cap slice pays the per-domain
    rank. At web scale that is a sort over the few megadomains, not
    the corpus.

    Output: the input rows that survive the cap (all input columns).
    NULL domains never equi-join the over-cap set, so they pass
    through uncapped — coalesce to a sentinel upstream if null
    domains must be bounded too.
    """
    counts = docs.groupBy(domain_col).agg(F.count("*").alias("__n"))
    over = counts.where(F.col("__n") > cap).select(domain_col)
    under = docs.join(F.broadcast(over), domain_col, "left_anti")
    w = Window.partitionBy(domain_col).orderBy(order_col)
    capped = (docs.join(F.broadcast(over), domain_col, "left_semi")
              .withColumn("__rk", F.row_number().over(w))
              .where(F.col("__rk") <= cap).drop("__rk"))
    return under.unionByName(capped)


def grouped_split(docs: DataFrame, val_frac: float = 0.1,
                  group_col: str = "source",
                  id_col: str = "doc_id") -> DataFrame:
    """Leakage-free train/validation split: the split is a pure
    function of the GROUP (domain/source), so templated pages and
    near-duplicates within a domain can never straddle the boundary —
    the failure mode of per-document splits that inflates validation
    scores. Deterministic (the :func:`_mix` fold over the ASCII
    polynomial group hash), engine-reproducible, zero shuffles — a
    codegen projection.

    Output: (id_col, group_col, split) with split in {'train','val'};
    ~``val_frac`` of GROUPS (not documents) land in val.
    """
    from maps_spark.operators.similarity import token_hash_col
    g = _mix(token_hash_col(F.col(group_col)))
    return docs.select(
        id_col, group_col,
        F.when(g < int(val_frac * P31), F.lit("val"))
        .otherwise(F.lit("train")).alias("split"))


BLOOM_SEED = 202407


def _bloom_positions(h_col, m_bits: int, n_hashes: int,
                     seed: int) -> F.Column:
    """Array of the ``n_hashes`` bloom bit positions for an int shingle
    hash: universal hashes ``((a_j*h + b_j) % p) % m_bits`` with seeded
    constants (shared with the oracle generator). Products < 2^62 —
    int64/BIGINT-exact in both engines."""
    from maps_spark.operators.dedup import minhash_perm_consts
    a, b = minhash_perm_consts(n_hashes, seed)
    return F.array(*[
        ((F.lit(int(a[j])) * h_col + F.lit(int(b[j]))) % P31) % m_bits
        for j in range(n_hashes)])


def bloom_filter_bits(benchmark: DataFrame, shingle_k: int = 3,
                      text_col: str = "text", m_bits: int = 1 << 17,
                      n_hashes: int = 3,
                      seed: int = BLOOM_SEED) -> DataFrame:
    """Bloom filter over the benchmark's distinct shingle hashes, as a
    table of 32-bit words: (word, w) where bit ``pos % 32`` of word
    ``pos div 32`` is set iff some benchmark shingle hashed to ``pos``.

    The compact alternative to broadcasting the full shingle set in
    :func:`contamination_check`: the filter is ``m_bits / 8`` bytes
    regardless of benchmark size (a 10^9-shingle benchmark fits a
    ~100 MB filter at 1% FP where the exact set would be tens of GB).
    Words are at most ``m_bits / 32`` rows — always broadcastable.

    Shingle identity is the char-polynomial hash of the shingle string
    (:func:`maps_spark.operators.similarity.token_hash_col` — ASCII
    scope, same family the hashing-trick vectors use), so the whole
    filter build is pure codegen + one tiny aggregation.
    """
    from maps_spark.operators.similarity import token_hash_col
    sh = (benchmark.select(F.explode(F.array_distinct(
        _shingle_array(text_col, shingle_k))).alias("sh")))
    h = sh.select(token_hash_col(F.col("sh")).alias("h")).distinct()
    pos = h.select(F.explode(
        _bloom_positions(F.col("h"), m_bits, n_hashes, seed))
        .alias("pos"))
    return (pos.select(
        F.expr("pos div 32").cast("int").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), "
               "CAST(pos % 32 AS INT))").alias("m"))
        .groupBy("word").agg(F.bit_or("m").alias("w")))


def bloom_contamination(docs: DataFrame, benchmark: DataFrame,
                        shingle_k: int = 3, text_col: str = "text",
                        m_bits: int = 1 << 17, n_hashes: int = 3,
                        threshold: float = 0.2,
                        seed: int = BLOOM_SEED) -> DataFrame:
    """:func:`contamination_check` through a bloom filter: per-document
    fraction of distinct shingle HASHES whose ``n_hashes`` filter bits
    are all set. Never misses a truly contaminated shingle (bloom filters
    have no false negatives); false positives overcount by a bounded,
    DETERMINISTIC amount — the same seeded hash family runs in the
    DuckDB oracle, so the gate hash-matches bit-for-bit, FPs included.

    Scale: the corpus side never ships shingle strings — each doc
    explodes to (doc_id, h) int pairs, probes the broadcast word table
    (map-side hash join), and folds back with two aggregations whose
    first reuses the distinct's (doc_id, h) partitioning. The
    benchmark side collapses to ``m_bits / 32`` words no matter how
    many shingles it holds — the scale win over the exact check.

    Output: (doc_id, n_shingles, n_flagged, contamination_scaled,
    flagged) — same shape as :func:`contamination_check` with
    ``n_flagged`` (maybe-contaminated) in place of the exact count.
    """
    from maps_spark.operators.similarity import token_hash_col
    bloom = bloom_filter_bits(benchmark, shingle_k, text_col, m_bits,
                              n_hashes, seed)
    dh = (docs.select(
        "doc_id", F.explode(F.array_distinct(
            _shingle_array(text_col, shingle_k))).alias("sh"))
        .select("doc_id", token_hash_col(F.col("sh")).alias("h"))
        .distinct())
    probes = (dh.select(
        "doc_id", "h",
        F.explode(_bloom_positions(F.col("h"), m_bits, n_hashes,
                                   seed)).alias("pos"))
        .select("doc_id", "h",
                F.expr("pos div 32").cast("int").alias("word"),
                F.expr("shiftleft(CAST(1 AS BIGINT), "
                       "CAST(pos % 32 AS INT))").alias("m")))
    hit = F.when(F.col("w").isNotNull()
                 & (F.expr("w & m") != 0), F.lit(1)).otherwise(F.lit(0))
    per_sh = (probes.join(F.broadcast(bloom), "word", "left")
              .select("doc_id", "h", hit.alias("hit"))
              .groupBy("doc_id", "h")
              .agg(F.min("hit").alias("sh_hit")))
    ratio = F.floor(F.col("n_flagged") * SCALE
                    / F.col("n_shingles")).cast("long")
    return (per_sh.groupBy("doc_id")
            .agg(F.count("*").alias("n_shingles"),
                 F.sum("sh_hit").alias("n_flagged"))
            .select("doc_id", "n_shingles",
                    F.col("n_flagged").cast("long").alias("n_flagged"),
                    ratio.alias("contamination_scaled"),
                    (ratio >= int(threshold * SCALE)).alias("flagged")))


def doc_dense_vectors(docs: DataFrame, dim: int = 64,
                      text_col: str = "text") -> DataFrame:
    """Dense hashing-trick document vectors: the sparse
    :func:`maps_spark.operators.similarity.doc_vector_buckets` counts
    zero-filled into an array column, so the k-means / ANN family can
    consume raw text without any embedding model. Exact integers.
    Documents with no tokens have no vector (and stay unclustered).

    Output: (vec_id, embedding array<long>).
    """
    from maps_spark.operators.similarity import dense_count_vectors
    return dense_count_vectors(docs, dim, text_col).select(
        F.col("doc_id").alias("vec_id"),
        F.col("counts").alias("embedding"))


def cluster_topics(docs: DataFrame, k: int = 8, iters: int = 3,
                   dim: int = 64, top_k: int = 10,
                   text_col: str = "text") -> DataFrame:
    """Corpus organization end-to-end: hash documents to dense count
    vectors (:func:`doc_dense_vectors`), cluster them with the exact
    distributed :func:`maps_spark.operators.similarity.kmeans_assign`,
    then label each cluster by its ``top_k`` most frequent words —
    the dependency-free topic map of a corpus (what you run before
    deciding mixture weights or spotting a scraped-boilerplate
    cluster).

    Scale: vectors and clustering are the audited k-means shape; the
    labelling pass is one token explode + an equi-join against the
    (tiny) assignment table + a map-side-combined (cluster, word)
    count, with the rank window running over per-cluster word counts,
    never the corpus.

    Output: (cluster, word, cnt, rank), rank <= top_k, ties broken
    (cnt desc, word asc) — deterministic, oracle-exact.
    """
    from pyspark.sql import Window

    from maps_spark.operators.similarity import kmeans_assign
    vecs = doc_dense_vectors(docs, dim, text_col)
    # counts are already integers: scale=1000 keeps centroid precision
    # at 1/1000 of a count while bounding the int64 distance sum
    # ((1000*c)^2 * dim <= 2^63 holds to per-bucket counts ~3.8e5 —
    # far above any real document; scale=1e6 would overflow at ~3e3)
    assign = kmeans_assign(vecs, k=k, iters=iters, scale=1000)
    toks = (docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != ""))
    counts = (toks.join(assign.select(F.col("vec_id").alias("doc_id"),
                                      "cluster"), "doc_id")
              .groupBy("cluster", "word")
              .agg(F.count("*").alias("cnt")))
    w = Window.partitionBy("cluster").orderBy(F.desc("cnt"), "word")
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k))


def collocations(docs: DataFrame, text_col: str = "text",
                 min_count: int = 5, scale: int = SCALE) -> DataFrame:
    """PMI-ranked collocation table — the corpus-linguistics signal
    behind multiword-token selection and tokenizer-merge auditing:
    adjacent pairs that co-occur far above unigram chance ("new york")
    versus merely frequent pairs ("of the", which PMI discounts).

    No float log: the emitted score is the PMI lift
    ``(c_pair * n_tok) / (c_w1 * c_w2)`` — a strictly monotone
    transform of PMI, so ranking is identical — computed as staged
    integer division ``((c_pair * scale) div c_w1) * n_tok div c_w2``
    in that exact order in both engines (first factor is <= scale
    because c_pair <= c_w1, so the product is int64-safe for corpora
    up to ~9e12 tokens).

    Scale: bigram and unigram counts are vocabulary-keyed aggs with
    map-side combine; the min_count filter runs before the two
    unigram joins, so only surviving pairs join; the token total
    rides a broadcast one-row join.

    Output: (w1, w2, c_pair, c_w1, c_w2, lift_scaled), pairs with
    c_pair >= min_count.
    """
    from maps_spark.operators.text import _doc_tokens
    toks = _doc_tokens(docs, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (toks.select("doc_id", F.col("word").alias("w1"),
                       F.lead("word").over(w).alias("w2"))
           .where(F.col("w2").isNotNull()))
    pair = (big.groupBy("w1", "w2").agg(F.count("*").alias("c_pair"))
            .where(F.col("c_pair") >= min_count))
    uni = toks.groupBy("word").agg(F.count("*").alias("c"))
    n = toks.agg(F.count("*").alias("n_tok"))
    return (pair
            .join(uni.select(F.col("word").alias("w1"),
                             F.col("c").alias("c_w1")), "w1")
            .join(uni.select(F.col("word").alias("w2"),
                             F.col("c").alias("c_w2")), "w2")
            .crossJoin(F.broadcast(n))
            .select("w1", "w2", "c_pair", "c_w1", "c_w2",
                    F.expr(f"((c_pair * {scale}) div c_w1) * n_tok "
                           f"div c_w2")
                    .cast("long").alias("lift_scaled")))


def novelty_score(docs: DataFrame, text_col: str = "text",
                  k: int = 8, scale: int = SCALE) -> DataFrame:
    """Per-document n-gram novelty — the memorization-risk /
    contribution signal dataset analyses report: the fraction of a
    document's DISTINCT word k-grams that occur in no other document
    (corpus doc-frequency 1). Boilerplate-heavy or copied documents
    score low; unique prose scores high.

    Exact integers end to end (df counts + one scaled division).
    Shapes: grams are per-doc distinct before the explode (so the
    gram shuffle is set-sized, not occurrence-sized), df is one
    gram-keyed agg with map-side combine, and the verdict joins back
    on the same gram key. Documents shorter than ``k`` tokens
    contribute their whole text as one gram.

    Output: (doc_id, n_grams, n_novel, novelty_scaled)."""
    w = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    grams = F.when(
        F.size(w) >= k,
        F.transform(F.sequence(F.lit(0), F.size(w) - k),
                    lambda i: F.array_join(
                        F.slice(w, i + 1, k), " "))
    ).otherwise(F.array(F.array_join(w, " ")))
    ex = (docs.select("doc_id",
                      F.explode(F.array_distinct(grams)).alias("g"))
          .where(F.col("g") != ""))
    dfreq = ex.groupBy("g").agg(F.count("*").alias("df"))
    return (ex.join(dfreq, "g")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_grams"),
                 F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                 .cast("long").alias("n_novel"))
            .withColumn("novelty_scaled",
                        F.expr(f"(n_novel * {scale}) div n_grams")
                        .cast("long")))


def group_sample(df: DataFrame, group_cols: list[str], k: int = 100,
                 id_col: str = "doc_id", margin: int = 32) -> DataFrame:
    """EXACT deterministic per-group sample: for every group, the
    ``k`` rows with the smallest ``(mix(id), id)`` — the balanced
    eval-set / per-class-quota primitive. No RNG state: the same k
    rows come out of any engine, partitioning, or rerun.

    Scale shape: a naive per-group ``row_number`` sorts ENTIRE
    groups; here a count pass derives an integer mix threshold that
    admits ~``margin * k`` expected survivors per group, the window
    then sorts only those. Exactness is preserved by a rescue pass:
    any group the probabilistic cut left with fewer than k survivors
    is re-admitted in full (deterministically — both engines take
    the same branch), so the result is always the true k smallest.
    Groups at or below ``margin * k`` rows skip the cut entirely.

    Output: the group columns + (id, sample_rank), rank 1..k.
    """
    tagged = (df.select(*group_cols, F.col(id_col).alias("_gs_id"))
              .withColumn("_gs_mix", _mix(F.col("_gs_id") % P31)))
    counts = (tagged.groupBy(*group_cols)
              .agg(F.count("*").alias("_gs_n")))
    thr = F.when(F.col("_gs_n") <= k * margin, F.lit(P31)) \
        .otherwise(F.expr(f"CAST({k} AS BIGINT) * {margin} * {P31} "
                          "DIV _gs_n"))
    cand = (tagged.join(counts, group_cols)
            .where(F.col("_gs_mix") < thr)
            .drop("_gs_n"))
    short = (cand.groupBy(*group_cols)
             .agg(F.count("*").alias("_gs_s"))
             .where(F.col("_gs_s") < k).select(*group_cols))
    pool = (cand.join(short, group_cols, "left_anti")
            .unionByName(tagged.join(short, group_cols, "left_semi")))
    w = Window.partitionBy(*group_cols).orderBy("_gs_mix", "_gs_id")
    return (pool.withColumn("_gs_rn", F.row_number().over(w))
            .where(F.col("_gs_rn") <= k)
            .select(*group_cols, F.col("_gs_id").alias(id_col),
                    F.col("_gs_rn").cast("int").alias("sample_rank")))


def group_sample_select(group_col: str = "source", k: int = 20,
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`group_sample` over documents: the
    prefilter/rescue machinery is a pure speedup, so the twin is the
    straight definition — row_number over (mix(id), id) per group."""
    return f"""WITH ranked AS (
  SELECT {group_col}, {id_col},
         row_number() OVER (PARTITION BY {group_col}
           ORDER BY {mix_sql(f"({id_col} % {P31})")}, {id_col})
           AS sample_rank
  FROM documents)
SELECT {group_col}, {id_col}, CAST(sample_rank AS INT) AS sample_rank
FROM ranked WHERE sample_rank <= {k}"""
