"""Bucketed document store: co-located joins for iterative curation.

A 100 TB curation pipeline is not one pass — quality scores get
re-tuned, dedup verdicts re-run, LM scores and embeddings attached,
each producing a per-doc annotation table that joins back to the
corpus on ``doc_id``. Done naively, every one of those joins re-shuffles
the full corpus. This module writes the corpus and its annotation
tables **bucketed by doc_id into the same bucket count**, so Spark's
bucketed-scan path proves co-partitioning at plan time and the joins
run map-side — zero Exchange, zero corpus shuffle (the plan-audit test
asserts exactly that).

Tables are EXTERNAL (``option("path", ...)``): the catalog entry only
records the bucket spec; data lives at the given path and survives
session restarts — re-register with :func:`register_existing` after a
new session starts. Bucket count is a store-level constant chosen once
(power of two, ~corpus_bytes / (buckets * files_per_bucket) ≈ 128 MB
per file at production scale); all tables in one store MUST share it,
which :func:`write_table` enforces through the store manifest.

Reference parity note: this plays the same role for documents that the
HFile bulk-load + salted key space plays for tiles in the reference
(spark-generate-maps/.../MapBuilder.java:92-104) — a write-once layout
that makes every later read/join cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from maps_spark.sources.tile_store import read_manifest, write_manifest


def _table_ident(store_name: str, table: str) -> str:
    return f"{store_name}_{table}"


def create_store(spark: SparkSession, root: str, name: str,
                 buckets: int = 64) -> None:
    """Initialise an empty store: manifest records the bucket contract
    every table write must honour."""
    write_manifest(root, {"name": name, "buckets": int(buckets),
                          "tables": []})


def write_table(df: DataFrame, root: str, table: str,
                sort_col: str = "doc_id") -> None:
    """Write ``df`` as a bucketed external table of the store at
    ``root``. Bucket column is always ``doc_id`` (the join key of every
    curation annotation); files are sorted by ``sort_col`` within each
    bucket so merge joins skip their sort at read time."""
    meta = read_manifest(root)
    ident = _table_ident(meta["name"], table)
    (df.write.mode("overwrite")
     .option("path", f"{root}/{table}")
     .bucketBy(meta["buckets"], "doc_id")
     .sortBy(sort_col)
     .saveAsTable(ident))
    if table not in meta["tables"]:
        meta["tables"] = sorted(meta["tables"] + [table])
    meta.setdefault("sorts", {})[table] = sort_col
    write_manifest(root, meta)


def read_table(spark: SparkSession, root: str, table: str) -> DataFrame:
    """Catalog-backed read (keeps the bucket spec visible to the
    planner — a plain ``spark.read.parquet`` of the same files would
    NOT, and joins would shuffle again)."""
    return spark.table(_table_ident(read_manifest(root)["name"], table))


def register_existing(spark: SparkSession, root: str) -> list[str]:
    """Re-attach a store written by an earlier session: re-issues the
    bucketed CREATE TABLE DDL (schema inferred from the parquet files)
    against the data already on disk, restoring the bucket spec the
    planner needs for shuffle-free joins."""
    meta = read_manifest(root)
    out = []
    for table in meta["tables"]:
        ident = _table_ident(meta["name"], table)
        if not spark.catalog.tableExists(ident):
            df = spark.read.parquet(f"{root}/{table}")
            schema_ddl = df._jdf.schema().toDDL()
            sort_col = meta.get("sorts", {}).get(table, "doc_id")
            spark.sql(
                f"CREATE TABLE {ident} ({schema_ddl}) USING PARQUET "
                f"CLUSTERED BY (doc_id) SORTED BY ({sort_col}) "
                f"INTO {meta['buckets']} BUCKETS "
                f"LOCATION '{root}/{table}'")
        out.append(ident)
    return out


def annotation_join(spark: SparkSession, root: str, base: str,
                    annotations: list[str]) -> DataFrame:
    """Join the base table with annotation tables on doc_id. With every
    input bucketed on doc_id at the store's shared bucket count, the
    planner proves co-partitioning and emits NO Exchange — at 100 TB
    this is the difference between an O(corpus) shuffle per annotation
    and a pure map-side merge."""
    df = read_table(spark, root, base)
    for a in annotations:
        df = df.join(read_table(spark, root, a), "doc_id")
    return df
