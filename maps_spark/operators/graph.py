"""Iterative graph operators: exact-integer PageRank.

PageRank (Brin & Page 1998) over an edge table is the canonical
link-graph reputation signal a web corpus pipeline feeds back into
source weighting and crawl-frontier priority. The distributed shape
is the textbook one — per iteration, one (rank div out-degree)
contribution join and one in-neighbor sum — expressed as DataFrame
joins/aggs so Catalyst plans each step; each iteration's result is
checkpointed so the plan stays one-iteration deep (at 100 TB the
alternative is an exponentially nested plan).

Exactness discipline (the k-means precedent): ranks are integers at
``scale``; the damping split is integer division
(``(dampen * sum) div den`` and a ``(scale * (den - dampen)) div
(den * N)`` base term), so both engines agree bitwise and the gate
hash-checks. Dangling nodes (no out-edges) leak their mass — the
simple documented variant; ranks need not sum to ``scale``. Edges
are treated as a distinct simple digraph.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PR_SCALE = 1_000_000_000_000  # 1e12: room for div by N and outdeg


def pagerank(edges: DataFrame, iters: int = 3,
             src_col: str = "src", dst_col: str = "dst",
             dampen: int = 85, den: int = 100,
             scale: int = PR_SCALE) -> DataFrame:
    """(node, rank_scaled) after ``iters`` exact-integer power steps.

    r0 = scale div N for every node;
    r'(v) = (scale * (den - dampen)) div (den * N)
            + (dampen * sum over in-edges of (r(u) div outdeg(u)))
              div den.
    """
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct().localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_scaled", F.lit(0).cast("long"))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = int((scale * (den - dampen)) // (den * n))
    r = nodes.withColumn("rank_scaled",
                         F.lit(int(scale // n)).cast("long"))
    for _ in range(iters):
        contrib = (e.join(r.withColumnRenamed("node", "src"), "src")
                   .join(outdeg, "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("rank_scaled div outdeg")
                           .alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r = (nodes.join(summed, "node", "left")
             .select("node",
                     (F.lit(base) + F.expr(
                         f"({dampen} * coalesce(s, 0)) div {den}"))
                     .cast("long").alias("rank_scaled"))
             .localCheckpoint())  # keep the plan one iteration deep
    return r


def pagerank_select(edges_cte: str, iters: int = 3,
                    dampen: int = 85, den: int = 100,
                    scale: int = PR_SCALE) -> str:
    """DuckDB twin: unrolled power iterations over ``edges_cte`` —
    a CTE body (ending in a SELECT) that yields (src, dst) rows.
    Same integer arithmetic, iteration for iteration."""
    ctes = [f"eraw AS ({edges_cte})",
            "e AS (SELECT DISTINCT src, dst FROM eraw)",
            """nodes AS (
  SELECT src AS node FROM e UNION SELECT dst AS node FROM e)""",
            "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes)",
            "od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1)",
            f"""r0 AS (
  SELECT node, CAST({scale} // n AS BIGINT) AS rank_scaled
  FROM nodes CROSS JOIN nn)"""]
    for i in range(iters):
        ctes.append(f"""c{i} AS (
  SELECT e.dst AS node,
         sum(r.rank_scaled // od.outdeg) AS s
  FROM e JOIN r{i} r ON r.node = e.src
  JOIN od ON od.src = e.src
  GROUP BY 1),
r{i + 1} AS (
  SELECT nodes.node,
         CAST(({scale} * ({den} - {dampen})) // ({den} * nn.n)
              + ({dampen} * COALESCE(c{i}.s, 0)) // {den} AS BIGINT)
           AS rank_scaled
  FROM nodes CROSS JOIN nn
  LEFT JOIN c{i} ON c{i}.node = nodes.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT node, rank_scaled FROM r{iters}")
