"""Watermarked stream-stream interval join: touches x conversions.

The one Structured Streaming operator class the rest of
:mod:`maps_spark.streaming` didn't exercise: a TRUE stream-stream
join, where BOTH sides are unbounded and Spark keeps per-side join
state bounded by event-time watermarks (SPARK-24865 semantics). The
batch operator :func:`maps_spark.operators.sessions.
attribute_conversions` answers "which touch gets credit" after the
fact; at ingest time a marketing/ads pipeline wants the joined
(touch, conversion) pairs materialized AS THEY ARRIVE, without
buffering either stream forever.

Shape: one event file stream is split into a touch side and a
conversion side (a self stream-stream join — both sides advance with
the same source), each watermarked on event time; the join condition
is user equality plus the attribution interval

    conv.ts - horizon <= touch.ts <= conv.ts

so Spark can expire a buffered touch once the watermark passes
``touch.ts + horizon`` and a buffered conversion once it passes
``conv.ts`` — state is O(horizon x arrival rate), never O(stream).
An INNER interval join emits each pair exactly when both sides have
arrived, so draining a backlog with ``availableNow`` yields exactly
the batch interval join of the full data (pinned by the twin test);
last-touch RANKING stays a downstream batch concern
(``attribute_conversions``) because ranking needs a per-conversion
barrier the streaming join deliberately does not impose.

The parquet sink is exactly-once via the sink's own commit log
(checkpoint under ``<out>/_checkpoint``) — no manual marker needed,
unlike the foreachBatch stores.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from maps_spark.operators.sessions import TS_US_SPARK
from maps_spark.streaming.refresh import _stream_parquet


def run_touch_conversion_join(spark: SparkSession, input_dir: str,
                              out_dir: str,
                              conversion: str = "purchase",
                              touches: tuple[str, ...] = ("click",
                                                          "view"),
                              horizon_s: int = 7 * 86400,
                              watermark: str = "30 days"):
    """Materialize (touch, conversion) pairs within the attribution
    horizon as an append-only parquet table at ``out_dir``.

    ``watermark`` trades completeness for state: pairs whose touch
    arrives more than the watermark after the stream's max event time
    are dropped as late (the standard streaming trade). The twin test
    uses a generous watermark so backlog drain equals the batch join;
    production sets it to the real out-of-orderness bound.

    Output: (conversion_id, user_id, conv_tus, touch_id, touch_type,
    touch_tus, lag_us) — the un-ranked superset of
    ``attribute_conversions``'s candidates.
    """
    # event time must be TIMESTAMP for watermarks; derive it from the
    # session-tz-independent epoch micros (timestamp_micros), never by
    # casting the NTZ column (which shifts by session timezone)
    ev = (_stream_parquet(spark, input_dir)
          .withColumn("tus", F.expr(TS_US_SPARK).cast("long"))
          .withColumn("ets", F.timestamp_micros(F.col("tus")))
          .withWatermark("ets", watermark))
    touch = (ev.where(F.col("event_type").isin(list(touches)))
             .select(F.col("user_id").alias("t_user"),
                     F.col("event_id").alias("touch_id"),
                     F.col("event_type").alias("touch_type"),
                     F.col("ets").alias("t_ts"),
                     F.col("tus").alias("touch_tus")))
    conv = (ev.where(F.col("event_type") == conversion)
            .select(F.col("user_id").alias("user_id"),
                    F.col("event_id").alias("conversion_id"),
                    F.col("ets").alias("c_ts"),
                    F.col("tus").alias("conv_tus")))
    joined = (conv.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") <= F.col("c_ts"))
        & (F.col("t_ts") >= F.col("c_ts")
           - F.expr(f"INTERVAL {int(horizon_s)} SECONDS")))
        .select("conversion_id", "user_id", "conv_tus", "touch_id",
                "touch_type", "touch_tus",
                (F.col("conv_tus") - F.col("touch_tus"))
                .alias("lag_us")))
    return (joined.writeStream
            .option("checkpointLocation", f"{out_dir}/_checkpoint")
            .option("path", f"{out_dir}/pairs")
            .trigger(availableNow=True)
            .format("parquet").outputMode("append").start())


def batch_touch_conversion_join(events, conversion: str = "purchase",
                                touches: tuple[str, ...] = ("click",
                                                            "view"),
                                horizon_s: int = 7 * 86400):
    """Batch twin of :func:`run_touch_conversion_join` over a static
    events frame — the equality oracle for the streamed pairs."""
    ev = events.withColumn("tus", F.expr(TS_US_SPARK).cast("long"))
    touch = (ev.where(F.col("event_type").isin(list(touches)))
             .select(F.col("user_id").alias("t_user"),
                     F.col("event_id").alias("touch_id"),
                     F.col("event_type").alias("touch_type"),
                     F.col("tus").alias("touch_tus")))
    conv = (ev.where(F.col("event_type") == conversion)
            .select("user_id",
                    F.col("event_id").alias("conversion_id"),
                    F.col("tus").alias("conv_tus")))
    return (conv.join(
        touch,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("touch_tus") <= F.col("conv_tus"))
        & (F.col("touch_tus") >= F.col("conv_tus")
           - F.lit(horizon_s * 1_000_000)))
        .select("conversion_id", "user_id", "conv_tus", "touch_id",
                "touch_type", "touch_tus",
                (F.col("conv_tus") - F.col("touch_tus"))
                .alias("lag_us")))
