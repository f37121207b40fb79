"""Multinomial Naive Bayes text classifier — dependency-free.

The role fasttext-style linear classifiers play in big curation
pipelines (CCNet/Dolma-style quality and domain routing): train on a
labeled slice, score the whole corpus, route by predicted label or
margin. This implementation is pure DataFrame aggregations, so it
needs no ML runtime, trains in two vocabulary-bounded shuffles, and —
because every log-probability is floored to an integer at ``scale``
per token occurrence — scores are exact in any aggregation order and
the DuckDB oracle matches bitwise (the same determinism contract as
:mod:`maps_spark.operators.mixture`).

Scale shape (100 TB): training aggregates are keyed by
(label, word) / (label) — vocabulary x classes, map-side combined,
never corpus-sized. Scoring decomposes

    score(c | d) = ln P(c) + sum_t ln P(t | c)
                 = prior(c) + n_tokens(d) * lp0(c)
                   + sum_{t seen in class c} tf(d,t) * dlp(c,t)

where ``lp0`` is the unseen-token log-prob and ``dlp`` the per-(class,
word) lift over it — so the per-document work is ONE equi-join of the
document's DISTINCT-word term frequencies against the (vocabulary x
classes) delta table plus a broadcast cross with the #classes-row
constant table. The join's intermediate is tf-rows x the classes that
actually contain each word (bounded by #classes, single digits to
dozens in practice), immediately map-side combined into (doc, label)
partials — never a dense per-token x class matrix; the argmax is a
per-document window over #classes rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

SCALE = 1_000_000


def nb_train_tables(model_docs: DataFrame, label_col: str = "label",
                    text_col: str = "text",
                    scale: int = SCALE) -> tuple[DataFrame, DataFrame]:
    """The trained model as two tables (the persistable artifact, cf.
    :mod:`maps_spark.sources.nb_model`):

    - ``classes``: (label, prior_lp, lp0) — #classes rows of integer
      constants (log prior and unseen-token log-prob at ``scale``);
    - ``delta``:   (label, word, dlp) — the per-(class, word) lift
      over ``lp0``, vocabulary x classes rows.
    """
    from maps_spark.operators.text import _doc_tokens

    lab = model_docs.select("doc_id", F.col(label_col).alias("label"))
    toks_m = _doc_tokens(model_docs, text_col).join(lab, "doc_id")
    cwc = toks_m.groupBy("label", "word").agg(F.count("*").alias("cnt"))
    cw = cwc.groupBy("label").agg(F.sum("cnt").alias("total"))
    v = toks_m.agg(
        F.greatest(F.countDistinct("word"), F.lit(1)).alias("v"))
    nd = lab.groupBy("label").agg(F.count("*").alias("nd"))
    n = lab.agg(F.count("*").alias("n"))

    denom = (F.col("total") + F.col("v")).cast("double")
    classes = (nd.crossJoin(F.broadcast(n)).join(cw, "label")
               .crossJoin(F.broadcast(v))
               .select(
                   "label",
                   F.floor(F.lit(float(scale)) * F.log(
                       F.col("nd").cast("double")
                       / F.col("n").cast("double")))
                   .cast("long").alias("prior_lp"),
                   F.floor(F.lit(float(scale)) * F.log(F.lit(1.0) / denom))
                   .cast("long").alias("lp0")))
    delta = (cwc.join(cw, "label").crossJoin(F.broadcast(v))
             .select(
                 "label", "word",
                 (F.floor(F.lit(float(scale)) * F.log(
                     (F.col("cnt") + 1).cast("double") / denom))
                  - F.floor(F.lit(float(scale))
                            * F.log(F.lit(1.0) / denom)))
                 .cast("long").alias("dlp")))
    return classes, delta


def nb_score(docs: DataFrame, classes: DataFrame, delta: DataFrame,
             text_col: str = "text") -> DataFrame:
    """Score documents against a trained model (the two tables from
    :func:`nb_train_tables`, fresh or loaded from a store). See
    :func:`nb_classify` for the output contract."""
    from maps_spark.operators.text import _doc_tokens

    tf = (_doc_tokens(docs, text_col)
          .groupBy("doc_id", "word").agg(F.count("*").alias("tf")))
    nt = tf.groupBy("doc_id").agg(F.sum("tf").alias("n_tokens"))
    seen = (tf.join(delta, "word")
            .groupBy("doc_id", "label")
            .agg(F.sum(F.col("tf") * F.col("dlp")).alias("seen_lp")))
    scores = (nt.crossJoin(F.broadcast(classes))
              .join(seen, ["doc_id", "label"], "left")
              .select("doc_id", "label",
                      (F.col("prior_lp")
                       + F.col("n_tokens") * F.col("lp0")
                       + F.coalesce("seen_lp", F.lit(0)))
                      .cast("long").alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "label")
    return (scores
            .select("doc_id", "label", "score",
                    F.row_number().over(w).alias("rk"),
                    F.lead("score").over(w).alias("nxt"))
            .where(F.col("rk") == 1)
            .select("doc_id", F.col("label").alias("pred_label"),
                    F.col("score").alias("score_scaled"),
                    (F.col("score") - F.coalesce("nxt", "score"))
                    .cast("long").alias("margin_scaled")))


def nb_classify(docs: DataFrame, model_docs: DataFrame,
                label_col: str = "label", text_col: str = "text",
                scale: int = SCALE) -> DataFrame:
    """Train multinomial NB on ``model_docs`` (labeled) and score every
    document in ``docs``; add-one smoothing over the model vocabulary:

        P(t | c) = (cnt(c, t) + 1) / (total(c) + V)

    Ties on score break on label ascending — fully deterministic.
    Documents with zero tokens have no defined likelihood and are
    absent from the output (the :mod:`mixture` exclusion contract).

    Composes :func:`nb_train_tables` + :func:`nb_score`; persist the
    tables with :mod:`maps_spark.sources.nb_model` to train once and
    score many corpora/batches.

    Output: (doc_id, pred_label, score_scaled, margin_scaled) where
    margin is the gap to the runner-up label (0 when single-class).
    """
    classes, delta = nb_train_tables(model_docs, label_col, text_col,
                                     scale)
    return nb_score(docs, classes, delta, text_col)


def classifier_eval(scored: DataFrame, labels: DataFrame,
                    pred_col: str = "pred_label",
                    label_col: str = "label",
                    id_col: str = "doc_id",
                    scale: int = SCALE) -> DataFrame:
    """Per-class classification quality as integer-exact counts — the
    ``ann_recall`` precedent applied to the classifier family:
    :func:`nb_classify` is hash-gated for determinism, this measures
    whether the determinism is USEFUL. Per class: tp / fp / fn /
    support plus precision, recall and F1, all integer-scaled with
    integer division (``floor(a/b)`` via ``div`` — never a double
    ratio, so counts past 2^53 stay exact and both engines agree
    bitwise). Empty denominators score 0 (the sklearn zero-division
    convention).

    Only documents present in BOTH frames are evaluated (the
    classifier's zero-token exclusion contract carries through);
    classes never predicted and classes never true both still get a
    row (full outer over the two per-class aggregations).

    Scale: two group-aggregations over (doc_id, pred, truth) pairs and
    one class-count-sized join — nothing is per-document after the
    first shuffle.

    Output: (label, tp, fp, fn, support, precision_scaled,
    recall_scaled, f1_scaled).
    """
    j = (scored.select(F.col(id_col).alias("id"),
                       F.col(pred_col).alias("pred"))
         .join(labels.select(F.col(id_col).alias("id"),
                             F.col(label_col).alias("truth")), "id"))
    p = (j.groupBy(F.col("pred").alias("label"))
         .agg(F.count("*").alias("n_pred"),
              F.sum(F.when(F.col("pred") == F.col("truth"), 1)
                    .otherwise(0)).alias("tp")))
    t = (j.groupBy(F.col("truth").alias("label"))
         .agg(F.count("*").alias("support")))
    m = (p.join(t, "label", "full_outer")
         .select("label",
                 F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
                 (F.coalesce("n_pred", F.lit(0))
                  - F.coalesce("tp", F.lit(0))).cast("long").alias("fp"),
                 (F.coalesce("support", F.lit(0))
                  - F.coalesce("tp", F.lit(0))).cast("long").alias("fn"),
                 F.coalesce("support", F.lit(0)).cast("long")
                 .alias("support")))

    def ratio(num: str, den: str) -> F.Column:
        return F.expr(f"CASE WHEN {den} = 0 THEN 0 "
                      f"ELSE ({num}) div ({den}) END").cast("long")

    s = int(scale)
    return m.select(
        "label", "tp", "fp", "fn", "support",
        ratio(f"tp * {s}", "tp + fp").alias("precision_scaled"),
        ratio(f"tp * {s}", "tp + fn").alias("recall_scaled"),
        ratio(f"2 * tp * {s}", "2 * tp + fp + fn").alias("f1_scaled"))
