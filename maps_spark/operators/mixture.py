"""Corpus mixture planning and importance-based data selection.

Two curation steps that sit ABOVE per-document filtering — deciding how
much of each source, and which documents, make the training mix:

- :func:`mix_plan` / :func:`mix_sample` implement token-budgeted source
  reweighting (the "data mixture" step of every pretraining recipe:
  given target weights per source and a total token budget, compute a
  per-source sampling rate and draw a deterministic hash sample at that
  rate). No RNG state anywhere — the sample is a pure function of
  doc_id, so the same mixture is reproducible on any cluster or engine.
- :func:`lm_crossentropy` scores documents under a bigram language
  model trained on a DIFFERENT corpus (with add-one smoothing and an
  unseen-bigram backoff), generalizing
  :func:`maps_spark.operators.corpus.lm_score` (whose model is the
  scored corpus itself).
- :func:`dsir_importance` / :func:`dsir_select` implement DSIR-style
  importance resampling (Xie et al. 2023, "Data Selection for Language
  Models via Importance Resampling", arXiv:2302.03169): importance =
  (cross-entropy under the raw-corpus model) minus (cross-entropy under
  the target-domain model); documents that look more like the target
  than the raw pool score high and are selected first.

Scale notes: the mixture plan aggregates per source (source cardinality
is tiny — one shuffle with map-side combine), and the sampler joins the
broadcast plan then filters in codegen — no corpus shuffle at all.
Cross-entropy scoring shuffles on bigram keys whose cardinality is
bounded by the model vocabulary, never the corpus; both model joins
reuse the one exploded-bigram pass. The final top-n selection is a
``TakeOrdered`` (no global sort materializes).

All outputs are exact integers (scaled logs, integer division) so the
DuckDB oracle (:mod:`maps_spark.sql.oracle_training`) matches bitwise.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from maps_spark.operators.corpus import SCALE, _mix


def mix_plan(docs: DataFrame, weights: dict[str, float],
             budget_tokens: int, text_col: str = "text",
             scale: int = SCALE) -> DataFrame:
    """Per-source sampling plan for a token-budgeted mixture.

    For each source s with target weight w_s (weights need not sum to
    1; they are used as given), the plan allocates
    ``target_tokens = floor(budget * w_s)`` and derives the keep rate
    ``rate_scaled = min(scale, target_tokens * scale div n_tokens)`` —
    a source with fewer tokens than its allocation is kept whole
    (rate 1.0), never upsampled. Sources absent from ``weights`` get
    weight 0 (dropped by :func:`mix_sample`).

    Output: (source, n_docs, n_tokens, w_scaled, target_tokens,
    rate_scaled) — exact integers throughout.
    """
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(s, int(round(w * scale))) for s, w in sorted(weights.items())],
        "source string, w_scaled long")
    per = (docs.select(
        "source",
        F.size(F.split(F.col(text_col), " ")).cast("long")
        .alias("n_tokens"))
        .groupBy("source").agg(F.count("*").alias("n_docs"),
                               F.sum("n_tokens").alias("n_tokens")))
    target = F.expr(f"{budget_tokens} * w_scaled div {scale}")
    return (per.join(F.broadcast(wdf), "source", "left")
            .withColumn("w_scaled", F.coalesce("w_scaled", F.lit(0)))
            .withColumn("target_tokens", target.cast("long"))
            .withColumn("rate_scaled",
                        F.least(F.lit(scale).cast("long"),
                                F.expr(f"target_tokens * {scale} "
                                       "div n_tokens").cast("long")))
            .select("source", "n_docs", "n_tokens", "w_scaled",
                    "target_tokens", "rate_scaled"))


def mix_sample(docs: DataFrame, weights: dict[str, float],
               budget_tokens: int, text_col: str = "text",
               id_col: str = "doc_id", scale: int = SCALE) -> DataFrame:
    """Draw the deterministic mixture sample described by
    :func:`mix_plan`: document d of source s is kept iff
    ``mix(doc_id) % scale < rate_scaled(s)`` — the same id-hash
    membership rule as :func:`maps_spark.operators.corpus.hash_sample`,
    applied per source at the plan's rate.

    The plan is broadcast (one row per source) and the filter runs
    inside codegen — sampling 100 TB shuffles nothing.

    Output: (doc_id, source, n_tokens) of kept documents.
    """
    plan = mix_plan(docs, weights, budget_tokens, text_col, scale)
    return (docs.select(
        F.col(id_col).alias("doc_id"), "source",
        F.size(F.split(F.col(text_col), " ")).cast("long")
        .alias("n_tokens"))
        .join(F.broadcast(plan.select("source", "rate_scaled")), "source")
        .where(_mix(F.col("doc_id")) % scale < F.col("rate_scaled"))
        .select("doc_id", "source", "n_tokens"))


def lm_crossentropy(docs: DataFrame, model_docs: DataFrame,
                    text_col: str = "text",
                    scale: int = SCALE) -> DataFrame:
    """Per-document NLL of ``docs`` under a bigram model trained on
    ``model_docs`` — add-one smoothing with an unseen backoff:

        P(w2|w1) = (c(w1,w2) + 1) / (c(w1,.) + V)

    where counts come from ``model_docs`` and V is the model vocabulary
    size; a bigram (or head word) the model never saw contributes
    c = 0 (so unseen-head bigrams cost ``-ln(1/V)``). Each bigram's
    log-prob is floored to an integer at ``scale`` before the sum —
    exact in any aggregation order, so the oracle matches bitwise.

    Exclusion (by design, shared with :func:`dsir_importance` /
    :func:`dsir_select`): documents with fewer than two tokens form no
    bigram and are ABSENT from the output — a bigram model assigns
    them no defined NLL. Filter or score such fragments upstream
    (``text_stats.n_tokens < 2``) if they must be ranked.
    When ``model_docs`` is ``docs`` itself this reduces exactly to
    :func:`maps_spark.operators.corpus.lm_score`.

    Scale: two model aggregations keyed by (w1, w2) / (w1) with
    map-side combine (vocabulary-bounded), one scalar broadcast, one
    (w1, w2) equi-join back to the scored corpus's exploded bigrams.

    Output: (doc_id, n_bigrams, nll_scaled, avg_nll_scaled).
    """
    from maps_spark.operators.text import _doc_tokens

    def _bigrams(d: DataFrame) -> DataFrame:
        toks = _doc_tokens(d, text_col)
        w = Window.partitionBy("doc_id").orderBy("pos")
        return (toks.select("doc_id", F.col("word").alias("w1"),
                            F.lead("word").over(w).alias("w2"))
                .where(F.col("w2").isNotNull()))

    big_m = _bigrams(model_docs)
    c2 = big_m.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    c1 = c2.groupBy("w1").agg(F.sum("cnt").alias("head"))
    v = (_doc_tokens(model_docs, text_col)
         .agg(F.greatest(F.countDistinct("word"), F.lit(1)).alias("v")))
    # (the greatest(..,1) only matters for a degenerate EMPTY model
    # corpus — V=0 would make every bigram's log-prob ln(1/0); with
    # V=1 unseen bigrams cost ln(1) = 0 instead of crashing the cast)
    big_d = _bigrams(docs)
    lp = F.floor(F.lit(float(scale)) * F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("head"), F.lit(0)) + F.col("v"))
        .cast("double"))).cast("long")
    return (big_d.join(c2, ["w1", "w2"], "left")
            .join(c1, "w1", "left").crossJoin(F.broadcast(v))
            .groupBy("doc_id").agg(
                F.count("*").alias("n_bigrams"),
                (-F.sum(lp)).cast("long").alias("nll_scaled"))
            .withColumn("avg_nll_scaled",
                        F.expr("nll_scaled div n_bigrams"))
            .select("doc_id", "n_bigrams", "nll_scaled",
                    "avg_nll_scaled"))


def dsir_importance(docs: DataFrame, target: DataFrame,
                    text_col: str = "text",
                    scale: int = SCALE) -> DataFrame:
    """DSIR importance weights: for each document,

        importance = avg NLL under the raw-corpus model
                   - avg NLL under the target-domain model

    (both per-bigram averages, integer-scaled). Positive importance
    means the target model explains the document better than the raw
    pool does — the document "looks like" the target domain. ``target``
    is typically a small high-quality seed set (a Wikipedia slice, a
    curated domain sample).

    Documents with fewer than two tokens have no bigrams, hence no
    importance row, and can never be selected — see
    :func:`lm_crossentropy` for the shared exclusion contract.

    Output: (doc_id, n_bigrams, nll_target_scaled, nll_corpus_scaled,
    importance_scaled).
    """
    from maps_spark.operators.text import _doc_tokens

    def _bigrams(d: DataFrame) -> DataFrame:
        toks = _doc_tokens(d, text_col)
        w = Window.partitionBy("doc_id").orderBy("pos")
        return (toks.select("doc_id", F.col("word").alias("w1"),
                            F.lead("word").over(w).alias("w2"))
                .where(F.col("w2").isNotNull()))

    def _model(big: DataFrame, toks_src: DataFrame, sfx: str):
        c2 = big.groupBy("w1", "w2").agg(F.count("*").alias(f"cnt{sfx}"))
        c1 = c2.groupBy("w1").agg(F.sum(f"cnt{sfx}").alias(f"head{sfx}"))
        v = toks_src.agg(F.greatest(F.countDistinct("word"), F.lit(1))
                         .alias(f"v{sfx}"))  # empty-model guard, see
        # lm_crossentropy — only bites when the model corpus is empty
        return c2, c1, v

    # ONE corpus-bigram explode feeds both model joins — scoring under
    # the target and the self model costs one corpus pass, not two
    # (both per-bigram log-probs reduce in the same aggregation).
    big_d = _bigrams(docs)
    c2t, c1t, vt = _model(_bigrams(target), _doc_tokens(target, text_col),
                          "_t")
    c2s, c1s, vs = _model(big_d, _doc_tokens(docs, text_col), "_s")

    def _lp(sfx: str):
        return F.floor(F.lit(float(scale)) * F.log(
            (F.coalesce(F.col(f"cnt{sfx}"), F.lit(0)) + 1).cast("double")
            / (F.coalesce(F.col(f"head{sfx}"), F.lit(0))
               + F.col(f"v{sfx}")).cast("double"))).cast("long")

    scored = (big_d.join(c2t, ["w1", "w2"], "left")
              .join(c1t, "w1", "left").crossJoin(F.broadcast(vt))
              .join(c2s, ["w1", "w2"], "left")
              .join(c1s, "w1", "left").crossJoin(F.broadcast(vs))
              .groupBy("doc_id").agg(
                  F.count("*").alias("n_bigrams"),
                  (-F.sum(_lp("_t"))).cast("long").alias("nt"),
                  (-F.sum(_lp("_s"))).cast("long").alias("ns")))
    return (scored.select(
        "doc_id", "n_bigrams",
        F.expr("nt div n_bigrams").alias("nll_target_scaled"),
        F.expr("ns div n_bigrams").alias("nll_corpus_scaled"))
        .withColumn("importance_scaled",
                    (F.col("nll_corpus_scaled")
                     - F.col("nll_target_scaled")).cast("long")))


def dsir_select(docs: DataFrame, target: DataFrame, n: int,
                text_col: str = "text", scale: int = SCALE) -> DataFrame:
    """Select the ``n`` documents most target-like by DSIR importance
    (ties break on doc_id — fully deterministic). The final cut is an
    ``orderBy().limit()`` — Spark plans it as TakeOrdered (per-partition
    top-n then a bounded driver merge), not a global sort.

    Sub-two-token documents carry no importance weight (no bigrams)
    and are excluded from the candidate pool — the
    :func:`lm_crossentropy` exclusion contract.

    Output: (doc_id, importance_scaled, sel_rank).
    """
    imp = dsir_importance(docs, target, text_col, scale)
    # the partition-less window is applied AFTER limit(n): it ranks at
    # most n rows (the selection size), never the corpus
    w = Window.orderBy(F.desc("importance_scaled"), "doc_id")
    return (imp.orderBy(F.desc("importance_scaled"), "doc_id").limit(n)
            .withColumn("sel_rank", F.row_number().over(w))
            .select("doc_id", "importance_scaled", "sel_rank"))


def quality_tiers(scored: DataFrame, score_col: str,
                  n_tiers: int = 4, ascending: bool = True,
                  id_col: str = "doc_id",
                  partitions: int | None = None) -> DataFrame:
    """Curriculum bucketing: rank every document by ``score_col``
    (ties on id — fully deterministic) and cut the ranking into
    ``n_tiers`` near-equal tiers — the "easy→hard" schedule input for
    curriculum training, or the "best quartile first" selection cut.

    The global rank comes from the distributed prefix-sum
    (:func:`maps_spark.operators.packing.global_cumsum` — range
    partition + bounded driver close), never a single-partition
    window. ``ascending=False`` ranks high scores first. Integer
    scores (e.g. ``avg_nll_scaled``) keep the whole table oracle-exact.

    Output: (doc_id, score, rank 0-based, tier 0..n_tiers-1).
    """
    from maps_spark.operators.packing import global_cumsum
    base = scored.select(
        F.col(id_col).alias("doc_id"),
        F.col(score_col).cast("long").alias("score"),
        (F.col(score_col).cast("long") if ascending
         else (-F.col(score_col).cast("long"))).alias("_ord"),
        F.lit(1).cast("long").alias("_one"))
    cum = global_cumsum(base, "_one", ["_ord", "doc_id"], partitions)
    total = scored.count()  # bounded driver scalar
    rank = (F.col("cum") - 1).cast("long")
    return cum.select(
        "doc_id", "score", rank.alias("rank"),
        F.expr(f"(cum - 1) * {n_tiers} div {total}").cast("int")
        .alias("tier"))


def weighted_sample(weighted: DataFrame, rate: float,
                    id_col: str = "doc_id",
                    weight_col: str = "weight_scaled",
                    wscale: int = 1_000_000) -> DataFrame:
    """Deterministic per-document WEIGHTED sampling — the consumer of
    :func:`maps_spark.operators.dedup.soft_dedup_weights`: document d
    is kept iff ``mix(id) < floor(rate * P31 * weight / wscale)``,
    i.e. the id-hash membership rule of :func:`mix_sample` with a
    per-document acceptance multiplier. With soft-dedup weights the
    expected kept mass of every near-dup cluster is ``rate`` times ONE
    document, however many copies exist — down-weighting without a
    dedup delete pass.

    Pure codegen filter (the same `_mix` fold), shuffles nothing,
    keeps all input columns. Deterministic: same ids in -> same rows
    out on any cluster size.
    """
    from maps_spark.operators.corpus import P31, _mix
    rate_p31 = int(rate * P31)
    thresh = F.expr(f"({rate_p31} * {weight_col}) div {wscale}")
    return weighted.where(_mix(F.col(id_col)) < thresh)


def negative_samples(pairs: DataFrame, candidates: DataFrame,
                     k: int = 4, oversample: int = 4,
                     num_buckets: int = 64,
                     anchor_col: str = "doc_a",
                     pos_col: str = "doc_b",
                     cand_col: str = "doc_id") -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor in ``pairs``, up to ``k`` pseudo-random candidates
    that are neither the anchor nor one of its positives.

    No RNG state and NO cross join: candidates hash into
    ``num_buckets`` buckets (the two-round :func:`_mix`), each anchor
    emits ``k + oversample`` probes whose target bucket is a pure
    function of (anchor, probe index), and each probe keeps the
    bucket member minimizing a probe-keyed mix — one bucket-equality
    shuffle join of anchors x probes against the candidate set, so
    the work is O(|anchors| * probes * bucket_size), never
    |anchors| x |candidates|. Oversampled probes absorb collisions
    with positives/self and duplicate draws; anchors can return
    fewer than ``k`` rows only if the probe budget is exhausted
    (deterministically — the same shortfall on every engine).

    Everything is int64-exact mixer arithmetic, so the DuckDB twin
    replays it bitwise. Output: (anchor, negative, rank) with rank
    1..k in probe order.
    """
    from maps_spark.operators.corpus import P31, _mix
    n_probes = k + oversample
    cands = (candidates.select(F.col(cand_col).alias("negative"))
             .distinct()
             .withColumn("bucket",
                         _mix(F.col("negative") % P31) % num_buckets))
    anchors = pairs.select(F.col(anchor_col).alias("anchor")).distinct()
    probes = (anchors
              .select("anchor", F.explode(
                  F.sequence(F.lit(0), F.lit(n_probes - 1))).alias("j"))
              .withColumn("bucket",
                          _mix(((F.col("anchor") % P31) * 64
                                + F.col("j")) % P31) % num_buckets))
    hits = probes.join(cands, "bucket")
    # per probe, keep the bucket member with the smallest probe-keyed
    # mix (ties on the candidate id) — a deterministic "draw"
    score = _mix(((F.col("negative") % P31) * 53
                  + (F.col("anchor") % P31) * 7 + F.col("j")) % P31)
    w_probe = Window.partitionBy("anchor", "j").orderBy(
        score.asc(), F.col("negative").asc())
    drawn = (hits.withColumn("rn", F.row_number().over(w_probe))
             .where(F.col("rn") == 1).drop("rn", "bucket"))
    # drop self-draws and positives of the SAME anchor
    pos = pairs.select(F.col(anchor_col).alias("anchor"),
                       F.col(pos_col).alias("negative")).distinct()
    neg = (drawn.where(F.col("negative") != F.col("anchor"))
           .join(pos, ["anchor", "negative"], "left_anti"))
    # a candidate drawn by two probes of one anchor counts once (the
    # earliest probe wins), then the first k draws survive
    w_dup = Window.partitionBy("anchor", "negative").orderBy("j")
    w_rank = Window.partitionBy("anchor").orderBy("j")
    return (neg.withColumn("rn", F.row_number().over(w_dup))
            .where(F.col("rn") == 1).drop("rn")
            .withColumn("rank", F.row_number().over(w_rank))
            .where(F.col("rank") <= k)
            .select("anchor", "negative",
                    F.col("rank").cast("int").alias("rank")))
