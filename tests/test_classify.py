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
