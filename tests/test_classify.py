"""Naive Bayes classifier: planted-vocabulary semantics + plan shape."""

import contextlib
import io

import pyspark.sql.functions as F


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, label string")


def test_nb_separates_planted_vocabularies(spark):
    from maps_spark.operators.classify import nb_classify
    train = _mk(spark, [
        (1, "spam offer winner prize offer", "bad"),
        (2, "offer prize click winner spam", "bad"),
        (3, "theorem proof lemma corollary", "good"),
        (4, "proof theorem induction lemma", "good"),
    ])
    test = _mk(spark, [
        (10, "winner offer prize", "?"),
        (11, "lemma proof theorem theorem", "?"),
    ])
    out = {r.doc_id: r for r in
           nb_classify(test, train, label_col="label").collect()}
    assert out[10].pred_label == "bad"
    assert out[11].pred_label == "good"
    assert out[10].margin_scaled > 0 and out[11].margin_scaled > 0


def test_nb_unseen_words_fall_to_prior(spark):
    from maps_spark.operators.classify import nb_classify
    # equal token totals (so the unseen-token cost matches) but 3 vs 1
    # training docs: a document of entirely unseen words must pick the
    # larger prior
    train = _mk(spark, [
        (1, "alpha beta", "big"), (2, "beta gamma", "big"),
        (3, "gamma alpha", "big"),
        (4, "delta epsilon zeta eta theta iota", "small"),
    ])
    test = _mk(spark, [(10, "zzz qqq xxy", "?")])
    [r] = nb_classify(test, train, label_col="label").collect()
    assert r.pred_label == "big"


def test_nb_excludes_zero_token_docs_and_breaks_ties_on_label(spark):
    from maps_spark.operators.classify import nb_classify
    train = _mk(spark, [(1, "x y", "a"), (2, "x y", "b")])
    test = _mk(spark, [(10, "", "?"), (11, "x", "?")])
    rows = nb_classify(test, train, label_col="label").collect()
    assert [r.doc_id for r in rows] == [11]
    # perfectly symmetric classes: tie breaks to label "a", margin 0
    assert rows[0].pred_label == "a" and rows[0].margin_scaled == 0


def test_nb_plan_broadcasts_class_tables(spark):
    from maps_spark.operators.classify import nb_classify
    from tests.conftest import SF_SMALL
    docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("doc_id", "text", "source"))
    out = nb_classify(docs, docs, label_col="source")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    # the classes-constant cross is a broadcast, never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # self-consistency: training labels are mostly recovered
    lab = docs.select("doc_id", F.col("source").alias("truth"))
    hit = (out.join(lab, "doc_id")
           .select(F.avg((F.col("pred_label") == F.col("truth"))
                         .cast("double")).alias("acc")).collect()[0].acc)
    # synthetic text carries weak source signal; the bar is "well
    # above the 1/20 chance floor", not memorization
    assert hit > 0.15


def test_stored_model_matches_fresh_training(spark, tmp_path):
    # the persisted-model path must reproduce nb_classify exactly —
    # this twin equality is what extends the oracle gate's coverage to
    # the store
    from maps_spark.operators.classify import nb_classify
    from maps_spark.sources.nb_model import (save_nb_model,
                                             score_with_model)
    from tests.conftest import SF_SMALL
    docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("doc_id", "text", "source"))
    root = str(tmp_path / "nb")
    m = save_nb_model(docs, root, label_col="source")
    assert m["n_classes"] == docs.select("source").distinct().count()
    stored = score_with_model(docs, root)
    fresh = nb_classify(docs, docs, label_col="source")
    a = sorted(map(tuple, stored.collect()))
    b = sorted(map(tuple, fresh.collect()))
    assert a == b and len(a) > 0


def test_streaming_classification_matches_batch(spark, tmp_path):
    from maps_spark.sources.nb_model import (save_nb_model,
                                             score_with_model)
    from maps_spark.streaming.classify import (
        run_streaming_classification)
    from tests.conftest import SF_SMALL
    src = f"{SF_SMALL}/documents.parquet"
    docs = (spark.read.parquet(src)
            .select("doc_id", "text", "source"))
    model = str(tmp_path / "model")
    out = str(tmp_path / "out")
    save_nb_model(docs, model, label_col="source")
    q = run_streaming_classification(spark, src, model, out)
    q.awaitTermination(300)
    preds = spark.read.parquet(f"{out}/predictions")
    batch = score_with_model(docs, model)
    a = sorted(map(tuple, preds.drop("batch_id").collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b
    # replay guard: restarting over the same files appends nothing
    q2 = run_streaming_classification(spark, src, model, out)
    q2.awaitTermination(300)
    assert spark.read.parquet(f"{out}/predictions").count() == len(a)


def test_classifier_eval_exact_confusion_arithmetic(spark):
    """Hand-built confusion: predictions (a,a,b,b,c) against truths
    (a,b,b,c,c) plus a truth-only class d and an unscored doc — every
    count and scaled ratio has a closed form."""
    from maps_spark.operators.classify import classifier_eval
    scored = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")],
        "doc_id long, pred_label string")
    labels = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b"), (4, "c"), (5, "c"),
         (6, "d"),           # never scored -> excluded entirely
         (7, "d")],
        "doc_id long, label string")
    got = {r.label: r for r in
           classifier_eval(scored, labels).collect()}
    assert set(got) == {"a", "b", "c"}  # d only on unscored docs
    a, b, c = got["a"], got["b"], got["c"]
    assert (a.tp, a.fp, a.fn, a.support) == (1, 1, 0, 1)
    assert (b.tp, b.fp, b.fn, b.support) == (1, 1, 1, 2)
    assert (c.tp, c.fp, c.fn, c.support) == (1, 0, 1, 2)
    assert a.precision_scaled == 500_000 and a.recall_scaled == 1_000_000
    assert a.f1_scaled == 666_666           # floor(2/3 * 1e6)
    assert b.precision_scaled == 500_000 and b.recall_scaled == 500_000
    assert b.f1_scaled == 500_000
    assert c.precision_scaled == 1_000_000 and c.recall_scaled == 500_000
    assert c.f1_scaled == 666_666
    # zero-division convention: a class predicted never and true never
    # hit simply cannot appear; a predicted-only class gets recall 0
    scored2 = scored.unionByName(spark.createDataFrame(
        [(8, "e")], "doc_id long, pred_label string"))
    labels2 = labels.unionByName(spark.createDataFrame(
        [(8, "a")], "doc_id long, label string"))
    e = {r.label: r for r in
         classifier_eval(scored2, labels2).collect()}["e"]
    assert (e.tp, e.fp, e.fn, e.support) == (0, 1, 0, 0)
    assert (e.precision_scaled, e.recall_scaled, e.f1_scaled) == (0, 0, 0)


def test_classifier_eval_floors(spark):
    """Quality floors (the ann_recall pattern: high floor on data with
    real signal, documented modest floor on the gate dataset). On
    planted disjoint vocabularies self-train micro-F1 is 1.0; on the
    gate dataset (label = source, 20 near-shared-vocabulary synthetic
    sources) the honest floor is 3x better than the 5% chance rate —
    that measured ~0.23 IS the documented quality of that gate."""
    from maps_spark.operators.classify import classifier_eval, nb_classify
    from tests.conftest import SF_SMALL
    vocab = {"cat": "purr whisker feline nap",
             "dog": "bark fetch kennel wag",
             "fish": "fin gill bubble swim"}
    rows = [(i * 4 + j, f"{w} {w} {w}", lab)
            for i, (lab, w) in enumerate(vocab.items())
            for j in range(4)]
    planted = spark.createDataFrame(
        rows, "doc_id long, text string, label string")
    ev = classifier_eval(
        nb_classify(planted, planted),
        planted.select("doc_id", "label")).collect()
    assert all(r.f1_scaled == 1_000_000 and r.fp == 0 and r.fn == 0
               for r in ev), ev
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    scored = nb_classify(docs, docs, label_col="source")
    gate = classifier_eval(scored, docs.select(
        "doc_id", F.col("source").alias("label"))).collect()
    tp = sum(r.tp for r in gate)
    total = sum(r.support for r in gate)
    n_classes = len(gate)
    assert total > 0 and n_classes >= 10
    assert tp / total >= 3.0 / n_classes, (tp, total, n_classes)
