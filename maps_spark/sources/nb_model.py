"""Persisted Naive Bayes model: train once, score anywhere.

:func:`maps_spark.operators.classify.nb_classify` retrains per call —
right for a one-shot audit, wrong for a serving or streaming path that
scores every arriving batch. This module splits the lifecycle the way
the tile and ANN stores do (build → small persisted artifact → cheap
reads):

- :func:`save_nb_model` materializes the two model tables from
  ``nb_train_tables`` (the #classes-row constants and the
  vocabulary x classes delta) as Parquet plus a manifest;
- :func:`score_with_model` reads them back and scores any corpus or
  micro-batch with exactly the classifier's arithmetic — the stored
  path inherits the ``nb_classify`` oracle gate through the batch-twin
  test in ``tests/test_classify.py``.

The model is tiny relative to any corpus (vocab x classes rows of
longs), so scoring a batch costs one broadcast of the classes table
plus one equi-join against the delta table — no retraining scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from maps_spark.operators.classify import SCALE, nb_score, nb_train_tables
from maps_spark.sources.tile_store import read_manifest, write_manifest


def save_nb_model(model_docs: DataFrame, root: str,
                  label_col: str = "label", text_col: str = "text",
                  scale: int = SCALE) -> dict:
    """Train on ``model_docs`` and persist the model under ``root``."""
    classes, delta = nb_train_tables(model_docs, label_col, text_col,
                                     scale)
    classes.coalesce(1).write.mode("overwrite").parquet(
        f"{root}/classes")
    # the delta table is vocab x classes: a handful of files, sorted by
    # word so a probe-side scan gets row-group pruning for free
    (delta.repartition(1).sortWithinPartitions("word", "label")
     .write.mode("overwrite").parquet(f"{root}/delta"))
    n_classes = classes.count()
    write_manifest(root, {"kind": "nb_model", "scale": scale,
                          "label_col": label_col, "text_col": text_col,
                          "n_classes": int(n_classes)})
    return read_manifest(root)


def load_nb_model(spark: SparkSession, root: str
                  ) -> tuple[DataFrame, DataFrame]:
    return (spark.read.parquet(f"{root}/classes"),
            spark.read.parquet(f"{root}/delta"))


def score_with_model(docs: DataFrame, root: str,
                     text_col: str | None = None) -> DataFrame:
    """Score ``docs`` against the stored model; same output contract
    as :func:`maps_spark.operators.classify.nb_classify`."""
    spark = docs.sparkSession
    classes, delta = load_nb_model(spark, root)
    tc = text_col or read_manifest(root).get("text_col", "text")
    return nb_score(docs, classes, delta, tc)
