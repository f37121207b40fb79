"""Streaming sketch maintenance: per-batch CMS / quantile-sketch
deltas merged into a persisted sketch store.

The batch sketches (:mod:`maps_spark.operators.sessions`:
``cms_build``, ``value_sketch``) are mergeable by COUNTER ADDITION —
exactly the property that makes them the right state for a stream: a
micro-batch's sketch is a tiny (<= depth*width / 63*subs rows) delta,
and folding it into the store is an integer sum, so the maintained
store is BIT-IDENTICAL to a batch build over everything ever seen
(pinned in tests — no approximation drift, the approximation lives
only in the sketch definition itself).

Per batch: build the batch sketch (map-side-combined, O(batch)), read
the tiny store, sum counters, overwrite. The store is one file per
sketch — counters never exceed the fixed bin space, so there is no
growth, no compaction, and replays are guarded by the same batch-id
marker as the pixel refresh (counter addition is not idempotent).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from maps_spark.operators.sessions import cms_build, value_sketch
from maps_spark.streaming.refresh import (_applied_batch, _commit_batch,
                                          _stream_parquet)


def _merge_into(delta: DataFrame, path: str, key_cols: list[str]) -> None:
    from pyspark.errors import AnalysisException
    spark = delta.sparkSession
    merged = delta
    try:
        existing = spark.read.parquet(path)
        merged = existing.unionByName(delta)
    except AnalysisException:  # first batch
        pass
    out = (merged.groupBy(*key_cols).agg(F.sum("cnt").alias("cnt"))
           .localCheckpoint())  # cut lineage: overwrite-in-place
    out.coalesce(1).write.mode("overwrite").parquet(path)


def run_sketch_refresh(spark: SparkSession, input_dir: str,
                       store_root: str, key_col: str = "user_id",
                       value_col: str = "value",
                       width: int = 1024, depth: int = 4):
    """Maintain ``store_root/cms`` (frequency) and ``store_root/values``
    (quantiles) over an event file stream. availableNow-triggered like
    the pixel refresh; both stores must equal the batch sketches of the
    union of all batches, counter for counter."""
    stream = _stream_parquet(spark, input_dir)
    marker = store_root.rstrip("/") + "_meta/last_batch.json"

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if _applied_batch(marker) >= batch_id:
            return
        _merge_into(cms_build(batch_df, key_col, width, depth),
                    f"{store_root}/cms", ["d", "bucket"])
        _merge_into(value_sketch(batch_df, value_col),
                    f"{store_root}/values", ["bin"])
        _commit_batch(marker, batch_id)

    return (stream.writeStream.foreachBatch(_merge)
            .trigger(availableNow=True).start())


def read_sketch_store(spark: SparkSession, store_root: str,
                      which: str) -> DataFrame:
    """``which`` in {'cms', 'values'}: the maintained counter table."""
    return spark.read.parquet(f"{store_root}/{which}")
