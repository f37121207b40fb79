"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship density-tile pipeline at sf0.001;
``queries``/``oracle_sql`` expose the operator inventory (SURVEY.md §2)
with DuckDB oracles generated from the same dual-dialect SQL templates
the engine executes, so value-hashes match bitwise.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: max-zoom pixel aggregation for every map view at
    sf0.001 (the first, biggest stage of the tile-pyramid build)."""
    from maps_spark.operators import pyramid as PY
    from maps_spark.sources.occurrence import occurrence_df

    occ = occurrence_df(spark, "/root/testdata/sf0.001")
    keyed = PY.keyed_occurrence(occ)
    return PY.pixel_table(keyed, "EPSG:3857", 8)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from maps_spark.plans.queries import MAPS_QUERIES
    return dict(MAPS_QUERIES)


def oracle_sql() -> dict[str, str]:
    from maps_spark.plans.queries import maps_oracles
    return maps_oracles()
