"""Structured Streaming refresh: the merged incremental pixel store
must equal the batch pipeline exactly (counts are associative)."""

import shutil

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL


class TestRefresh:
    def test_stream_merge_equals_batch(self, spark, tmp_path):
        from maps_spark.operators import pyramid as PY
        from maps_spark.sources.occurrence import occurrence_df
        from maps_spark.streaming.refresh import run_refresh

        store = str(tmp_path / "pixels")
        q = run_refresh(spark, f"{SF_SMALL}/events.parquet",
                        f"{SF_SMALL}/nation.parquet", store,
                        srs="EPSG:3857", zoom=6)
        q.awaitTermination(300)

        merged = spark.read.parquet(store + ".next")
        batch = PY.pixel_table(
            PY.keyed_occurrence(occurrence_df(spark, SF_SMALL)),
            "EPSG:3857", 6)
        diff = (merged.exceptAll(batch).count() +
                batch.exceptAll(merged).count())
        assert diff == 0

    def test_windowed_watermark_agg(self, spark):
        from maps_spark.streaming.refresh import windowed_event_counts

        w = windowed_event_counts(spark, f"{SF_SMALL}/events.parquet")
        q = (w.writeStream.outputMode("append").format("memory")
             .queryName("winagg_test").trigger(availableNow=True).start())
        q.awaitTermination(300)
        out = spark.sql("SELECT * FROM winagg_test")
        assert out.count() > 0
        assert {"window_start", "event_type", "n", "total_value"} <= set(
            out.columns)
