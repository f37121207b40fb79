"""The ``occurrence`` table: the engine's primary input.

The reference consumes a 20-column projection of GBIF's occurrence store
(MapBuilder.java:53-79). The driver's TESTDATA has no such table, so we
derive a deterministic occurrence view from ``events`` x ``nation``
(FIXTURES.md §6): integer-arithmetic lat/lng/year/flags keyed off
``event_id``/``user_id`` — every derivation is exact integer or
decimal-by-100 math, so Spark and the DuckDB oracle agree bitwise.

``OCCURRENCE_SQL`` is dual-dialect: the same text runs under
``spark.sql`` (with ``events``/``nation`` temp views) and inside DuckDB.

The taxon hierarchy is functional (species -> genus -> family -> kingdom
by integer division) so the taxon map-key fan-out nests like the
reference's classification paths (MapKeysUDF.java:155-173).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from maps_spark.sql import dual

# -- dual-dialect derivation -------------------------------------------------

# CAST the division to DOUBLE *before* the subtraction: Spark types
# `int / 100.0` as exact decimal while DuckDB divides in double; casting
# the division result first makes both sides the correctly-rounded double
# of the same exact rational, and the following subtraction is then the
# same double op in both engines.
_LAT = ("CAST(((e.user_id * 7919 + e.event_id * 13) % 18001) / 100.0"
        " AS DOUBLE) - 90.0")
_LNG = ("CAST(((e.event_id * 104729 + e.user_id * 17) % 36001) / 100.0"
        " AS DOUBLE) - 180.0")

_BOR_CASE = """CASE e.event_type
      WHEN 'click' THEN 'HUMAN_OBSERVATION'
      WHEN 'view' THEN 'OBSERVATION'
      WHEN 'purchase' THEN 'PRESERVED_SPECIMEN'
      WHEN 'signup' THEN 'MACHINE_OBSERVATION'
      WHEN 'error' THEN 'MATERIAL_SAMPLE'
      ELSE 'OCCURRENCE' END"""

OCCURRENCE_SQL = f"""
SELECT
  e.event_id                                         AS occurrenceId,
  CASE WHEN e.event_id % 97 = 0 THEN NULL ELSE {_LAT} END  AS decimalLatitude,
  CASE WHEN e.event_id % 101 = 0 THEN NULL ELSE {_LNG} END AS decimalLongitude,
  {_BOR_CASE}                                        AS basisOfRecord,
  CASE WHEN e.event_id % 111 = 0 THEN NULL
       ELSE 1850 + CAST((e.event_id + e.user_id) % 175 AS BIGINT) END AS year,
  'ds-' || CAST(e.user_id % 40 AS BIGINT)            AS datasetKey,
  'org-' || CAST(e.user_id % 13 AS BIGINT)           AS publishingOrgKey,
  n.n_name                                           AS countryCode,
  'PC' || CAST(e.event_id % 20 AS BIGINT)            AS publishingCountry,
  'k' || CAST(floor((e.event_id % 400) / 80) AS BIGINT) AS kingdomKey,
  'f' || CAST(floor((e.event_id % 400) / 20) AS BIGINT) AS familyKey,
  'g' || CAST(floor((e.event_id % 400) / 5) AS BIGINT)  AS genusKey,
  's' || CAST(e.event_id % 400 AS BIGINT)            AS speciesKey,
  e.event_id % 89 = 0                                AS hasGeospatialIssues,
  CASE WHEN e.event_id % 83 = 0 THEN 'ABSENT' ELSE 'PRESENT' END
                                                     AS occurrenceStatus,
  e.value                                            AS sampleValue
FROM events e
JOIN nation n ON n.n_nationkey = e.user_id % 25
"""

# Base predicate (MapBuilder.java:75-79): coords present, no geo issues,
# status PRESENT.
BASE_FILTER_SQL = (
    "decimalLatitude IS NOT NULL AND decimalLongitude IS NOT NULL "
    "AND hasGeospatialIssues = false AND occurrenceStatus = 'PRESENT'"
)

TAXON_RANKS = {"kingdom": "kingdomKey", "family": "familyKey",
               "genus": "genusKey", "species": "speciesKey"}


def occurrence_cte(sf_dir: str | None = None) -> str:
    """Oracle CTE: filtered occurrence view. With ``sf_dir`` the raw
    parquet paths are inlined; without it the pre-registered DuckDB views
    (``events``/``nation``) are used — the driver provides those."""
    sql = OCCURRENCE_SQL
    if sf_dir:
        sql = sql.replace(
            "FROM events e",
            f"FROM '{sf_dir}/events.parquet' e").replace(
            "JOIN nation n",
            f"JOIN '{sf_dir}/nation.parquet' n")
    return f"WITH occ AS (SELECT * FROM ({sql}) WHERE {BASE_FILTER_SQL})"


def mapkeys_cte(sf_dir: str | None = None) -> str:
    """Oracle CTE adding the exploded ``mapKey`` (UNION ALL per key type —
    semantically equal to the engine's single-explode fan-out)."""
    keys = ["SELECT o.*, '0:0' AS mapKey FROM occ o"]
    for c in TAXON_RANKS.values():
        keys.append(f"SELECT o.*, '1:c0|' || {c} AS mapKey FROM occ o")
    keys.append("SELECT o.*, '2:' || datasetKey AS mapKey FROM occ o")
    keys.append("SELECT o.*, '3:' || publishingOrgKey AS mapKey FROM occ o")
    keys.append("SELECT o.*, '4:' || countryCode AS mapKey FROM occ o "
                "WHERE countryCode IS NOT NULL")
    keys.append("SELECT o.*, '5:' || publishingCountry AS mapKey FROM occ o")
    # networkKey array fan-out (engine: explode of the array column)
    keys.append("SELECT o.*, '6:net-' || CAST(occurrenceId % 7 AS BIGINT) "
                "AS mapKey FROM occ o WHERE occurrenceId % 3 = 0")
    keys.append("SELECT o.*, '6:net-global' AS mapKey FROM occ o "
                "WHERE occurrenceId % 10 = 0")
    # c1 checklist arms (engine: classifications map fan-out)
    keys.append("SELECT o.*, '1:c1|' || familyKey AS mapKey FROM occ o "
                "WHERE occurrenceId % 2 = 0")
    keys.append("SELECT o.*, '1:c1|' || speciesKey AS mapKey FROM occ o "
                "WHERE occurrenceId % 2 = 0")
    union = " UNION ALL ".join(keys)
    return f"{occurrence_cte(sf_dir)}, keyed AS ({union})"


# -- Spark side --------------------------------------------------------------

_FACT_TABLES = frozenset(("events", "documents", "embeddings", "lineitem",
                          "orders"))


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Ensure a fact input feeds every core.

    The driver's small-SF tables are single-row-group parquet files, so
    a scan yields ONE partition and the whole first stage (scan +
    explode + partial agg) runs on one thread. Repartitioning a few MB
    is free; on a real deployment inputs arrive in thousands of row
    groups and this is a no-op."""
    p = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def register_testdata(spark: SparkSession, sf_dir: str,
                      tables: tuple[str, ...] = (
                          "region", "nation", "customer", "supplier", "part",
                          "orders", "lineitem", "events", "documents",
                          "embeddings")) -> None:
    for t in tables:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t in _FACT_TABLES:
            df = spread(spark, df)
        df.createOrReplaceTempView(t)


def occurrence_df(spark: SparkSession, sf_dir: str,
                  base_filter: bool = True) -> DataFrame:
    """Occurrence DataFrame. The nation join is broadcast (25 rows); the
    filter + projection push into the parquet scan via Catalyst.

    ``networkKey`` is an array<string> (0-2 networks per record) —
    exercising the reference's array-typed key fan-out
    (MapKeysUDF.java:119, WrappedArray<String>). The oracle mirrors the
    fan-out with per-network UNION ALL arms (mapkeys_cte)."""
    register_testdata(spark, sf_dir, ("events", "nation"))
    df = spark.sql(OCCURRENCE_SQL)
    if base_filter:
        df = df.where(BASE_FILTER_SQL)
    return with_network_key(df)


def with_network_key(df: DataFrame) -> DataFrame:
    """Attach the reference's two nested-typed columns:

    - ``networkKey``: array<string>, 0-2 networks per record;
    - ``classifications``: map<string, array<string>> — checklistKey ->
      taxon path (MapKeysUDF.java:114). ``c0`` is the full 4-rank path;
      even records additionally carry a sparser ``c1`` checklist
      (family + species only).
    """
    import pyspark.sql.functions as F
    oid = F.col("occurrenceId")
    df = df.withColumn("networkKey", F.array_compact(F.array(
        F.when(oid % 3 == 0,
               F.concat(F.lit("net-"), (oid % 7).cast("string"))),
        F.when(oid % 10 == 0, F.lit("net-global")))))
    c0 = F.array("kingdomKey", "familyKey", "genusKey", "speciesKey")
    c1 = F.when(oid % 2 == 0, F.array("familyKey", "speciesKey"))
    return df.withColumn(
        "classifications",
        F.map_filter(F.map_from_arrays(
            F.array(F.lit("c0"), F.lit("c1")), F.array(c0, c1)),
            lambda _, v: v.isNotNull()))
