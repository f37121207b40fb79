"""Streaming ANN ingest: embedding files landing in a directory are
appended to the persisted IVF index, batch by batch.

Completes the index lifecycle split of :mod:`maps_spark.sources.
ann_index`: ``build_ivf_index`` is the periodic retrain,
``upsert_ivf_index`` the incremental add — this module wires the latter
into Structured Streaming so a landing zone of embedding parquet files
feeds the served index continuously. Per micro-batch cost is
O(batch + touched clusters) (see the upsert's pruned existing-id
probe); the foreachBatch body is replay-guarded with the same batch-id
marker as the pixel refresh, and the upsert itself is idempotent on
ids, so the pipeline is at-least-once safe twice over.

Quantizer drift: the stream never retrains — centroids stay those of
the last ``build_ivf_index``. Monitor ``index_stats`` occupancy and
rebuild out-of-band when skew grows; the stream keeps appending against
the new centroids the moment the manifest swaps.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from maps_spark.sources.ann_index import upsert_ivf_index


def run_ann_ingest(spark: SparkSession, input_path: str, root: str,
                   max_files_per_trigger: int = 1,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   expectations: dict | None = None):
    """Wire the stream: embedding files -> per-batch index upsert.

    ``availableNow`` drains the backlog and stops (landing-zone sweep);
    a live feed would use a processing-time trigger with the same body.
    Requires an existing index at ``root`` (build_ivf_index first).
    """
    from maps_spark.streaming.refresh import _applied_batch, _commit_batch
    marker = root.rstrip("/") + "/_meta/last_batch.json"
    schema = spark.read.parquet(input_path).schema
    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if os.path.isfile(input_path):
        stream = reader.option(
            "pathGlobFilter", os.path.basename(input_path)).parquet(
            os.path.dirname(input_path))
    else:
        stream = reader.parquet(input_path)

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        if _applied_batch(marker) >= batch_id:
            return
        from maps_spark.streaming.refresh import quarantine_gate
        quarantine_gate(batch_df, expectations, root, batch_id)
        upsert_ivf_index(batch_df, root, id_col=id_col, vec_col=vec_col)
        _commit_batch(marker, batch_id)

    return (stream.writeStream.foreachBatch(_body)
            .trigger(availableNow=True).start())
