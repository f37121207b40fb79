"""maps_spark — a PySpark-native tile/analytics engine.

A from-scratch re-expression of the query + data-processing capabilities of
gbif/maps (reference surveyed in SURVEY.md) in idiomatic PySpark:

- DataFrame/SQL declarative plans; Catalyst handles pushdown/pruning.
- The zoom-pyramid rollup is a single max-zoom projection + bit-shift
  re-aggregations (mirrors TileMapBuilder.java:129-138 semantics).
- The HBase tile store is replaced by a partitioned, sorted Parquet tile
  index (partition pruning takes the place of salted point-gets).
- Serving-time filtering/binning/capabilities are batch DataFrame queries
  with identical semantics to the reference's in-memory filters.
- Training-data pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) extend the engine beyond the reference.
"""

__version__ = "0.1.0"
