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
from pyspark.sql import DataFrame, Window

PR_SCALE = 1_000_000_000_000  # 1e12: room for div by N and outdeg


def pagerank(edges: DataFrame, iters: int = 3,
             src_col: str = "src", dst_col: str = "dst",
             dampen: int = 85, den: int = 100,
             scale: int = PR_SCALE,
             warm_start: DataFrame | None = None) -> DataFrame:
    """(node, rank_scaled) after ``iters`` exact-integer power steps.

    r0 = scale div N for every node;
    r'(v) = (scale * (den - dampen)) div (den * N)
            + (dampen * sum over in-edges of (r(u) div outdeg(u)))
              div den.

    ``warm_start`` is an optional prior (node, rank_scaled) table —
    typically a previous build's converged ranks over a slightly
    smaller graph. Nodes present in it start from their prior rank;
    new nodes start uniform. One refresh iteration from a warm prior
    tracks the power-iteration fixed point about as closely as three
    from uniform (pinned in tests), which is the read-path economics a
    growing crawl store needs: gates keep the deterministic cold path.
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
    if warm_start is not None:
        # Renormalize the prior onto the grown graph: new nodes start
        # uniform (scale div n) and the matched prior ranks are scaled
        # so total mass stays ~scale — without this, a prior from a
        # smaller graph injects ~scale of mass PLUS the new nodes'
        # uniform shares and every rank starts biased high. The ratio
        # rides a double (the warm path is a serving approximation;
        # gates use the integer-exact cold path).
        joined = (nodes.join(warm_start.select(
                      "node", F.col("rank_scaled").alias("_prior")),
                      "node", "left")
                  .localCheckpoint())
        prior_sum, n_new = joined.agg(
            F.sum("_prior"), F.sum(F.when(F.col("_prior").isNull(),
                                          1).otherwise(0))).first()
        target = max(scale - int(n_new or 0) * (scale // n), 0)
        ratio = (target / int(prior_sum)) if prior_sum else 0.0
        r = (joined.select(
                 "node",
                 F.coalesce((F.col("_prior") * F.lit(ratio))
                            .cast("long"),
                            F.lit(int(scale // n)).cast("long"))
                 .alias("rank_scaled"))
             .localCheckpoint())
    else:
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


HITS_SCALE = 1_000_000_000  # 1e9: headroom for sum-over-edges at 1e9 edges


def hits(edges: DataFrame, iters: int = 2,
         src_col: str = "src", dst_col: str = "dst",
         scale: int = HITS_SCALE) -> DataFrame:
    """Exact-integer HITS (Kleinberg 1999): per node, hub and
    authority scores over a distinct simple digraph.

    Per iteration: a_raw(v) = sum of h(u) over in-edges, then
    a(v) = a_raw(v) div greatest(1, total_a div scale) — an
    integer L1-style normalization both engines compute bitwise
    identically (no float norm, no overflow: scores stay ~scale, so
    raw sums are bounded by scale * edges). Hubs update from the
    fresh authorities the same way. Nodes with no in-edges get
    authority 0, no out-edges hub 0.

    Output: (node, hub_scaled, auth_scaled)."""
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct().localCheckpoint())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    h = nodes.withColumn("h", F.lit(scale).cast("long"))
    a = nodes.withColumn("a", F.lit(0).cast("long"))
    for _ in range(iters):
        araw = (e.join(h.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("h").alias("raw")))
        a = _l1_scale(nodes, araw, scale, "a")
        hraw = (e.join(a.withColumnRenamed("node", "dst"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("a").alias("raw")))
        h = _l1_scale(nodes, hraw, scale, "h")
    return (nodes.join(h, "node", "left").join(a, "node", "left")
            .select("node",
                    F.coalesce("h", F.lit(0)).cast("long")
                    .alias("hub_scaled"),
                    F.coalesce("a", F.lit(0)).cast("long")
                    .alias("auth_scaled")))


def _l1_scale(nodes: DataFrame, raw: DataFrame, scale: int,
              out: str) -> DataFrame:
    """(node, out): raw div greatest(1, sum(raw) div scale) over all
    nodes, 0 where raw is absent; checkpointed one-iteration deep."""
    total = raw.agg(F.sum("raw").alias("t"))
    return (nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(total))
            .select("node",
                    F.expr(f"coalesce(raw, 0) div "
                           f"greatest(1, t div {scale})")
                    .cast("long").alias(out))
            .localCheckpoint())


def hits_select(edges_cte: str, iters: int = 2,
                scale: int = HITS_SCALE) -> str:
    """DuckDB twin of :func:`hits`: unrolled iterations over
    ``edges_cte`` (a CTE body yielding (src, dst)), same integer
    arithmetic step for step."""
    ctes = [f"eraw AS ({edges_cte})",
            "e AS (SELECT DISTINCT src, dst FROM eraw)",
            """nodes AS (
  SELECT src AS node FROM e UNION SELECT dst AS node FROM e)""",
            f"""h0 AS (
  SELECT node, CAST({scale} AS BIGINT) AS h FROM nodes)""",
            # a0 so the iters=0 boundary is valid SQL, matching the
            # Spark twin's (hub=scale, auth=0) initial state
            "a0 AS (SELECT node, CAST(0 AS BIGINT) AS a FROM nodes)"]
    for i in range(iters):
        ctes.append(f"""ar{i} AS (
  SELECT e.dst AS node, sum(h{i}.h) AS raw
  FROM e JOIN h{i} ON h{i}.node = e.src GROUP BY 1),
at{i} AS (SELECT COALESCE(sum(raw), 0) AS t FROM ar{i}),
a{i + 1} AS (
  SELECT nodes.node,
         CAST(COALESCE(ar{i}.raw, 0)
              // greatest(1, at{i}.t // {scale}) AS BIGINT) AS a
  FROM nodes CROSS JOIN at{i}
  LEFT JOIN ar{i} ON ar{i}.node = nodes.node),
hr{i} AS (
  SELECT e.src AS node, sum(a{i + 1}.a) AS raw
  FROM e JOIN a{i + 1} ON a{i + 1}.node = e.dst GROUP BY 1),
ht{i} AS (SELECT COALESCE(sum(raw), 0) AS t FROM hr{i}),
h{i + 1} AS (
  SELECT nodes.node,
         CAST(COALESCE(hr{i}.raw, 0)
              // greatest(1, ht{i}.t // {scale}) AS BIGINT) AS h
  FROM nodes CROSS JOIN ht{i}
  LEFT JOIN hr{i} ON hr{i}.node = nodes.node)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT nodes.node, h{iters}.h AS hub_scaled, "
              f"a{iters}.a AS auth_scaled\nFROM nodes "
              f"JOIN h{iters} ON h{iters}.node = nodes.node "
              f"JOIN a{iters} ON a{iters}.node = nodes.node")


def _walk_pick(start, walk, node, t):
    """Deterministic per-step draw for the walk family, nonlinear in
    (start, node) jointly: two independently mixed halves multiplied
    mod P31. A single affine mixer is NOT enough — mix(x) here is
    (x*A*C + B*C + D) mod p, so a constant start offset would shift
    every colliding walk's pick by the same amount and walks meeting
    at a node would still share suffixes. The product of the
    (start, walk) half and the (node, step) half makes the offset
    vary with the collision site, so walks diverge again after
    meeting. All operands < 2^31, products < 2^62 — int64-exact,
    replayed bitwise by :func:`_walk_pick_sql` in DuckDB."""
    from maps_spark.operators.corpus import _mix
    from maps_spark.operators.dedup import P31
    a = _mix(((start % P31) * 131 + walk) % P31)
    b = _mix(((node % P31) * 8191 + t) % P31)
    return (a * b) % P31


def _walk_pick_sql(start: str, walk: str, node: str, t) -> str:
    """DuckDB twin of :func:`_walk_pick` (same halves, same fold)."""
    from maps_spark.operators.corpus import mix_sql
    from maps_spark.operators.dedup import P31
    a = mix_sql(f"((({start}) % {P31}) * 131 + ({walk})) % {P31}")
    b = mix_sql(f"((({node}) % {P31}) * 8191 + ({t})) % {P31}")
    return f"((({a}) * ({b})) % {P31})"


def random_walks(edges: DataFrame, walk_len: int = 5,
                 walks_per_node: int = 2) -> DataFrame:
    """Deterministic DeepWalk-style random walks — the corpus
    generator for graph-embedding training (Perozzi et al. 2014):
    ``walks_per_node`` walks of up to ``walk_len`` nodes from every
    source node of the integer-keyed edge set.

    No RNG state: at node v, step t of walk w started at s follows
    the neighbor at index ``_walk_pick(s, w, v, t) mod degree(v)``
    (mix(s,w) * mix(v,t) mod p — nonlinear in (s, v) so walks that
    meet at a node diverge again; see :func:`_walk_pick`), with
    neighbors ranked once by (src, dst) — a pure function of the
    graph, so the same walks come out of any cluster, any engine
    (the DuckDB twin replays the arithmetic bitwise), and any rerun.
    Dead ends (nodes without out-edges) simply end the walk early.

    Plan shape: adjacency ranks + degrees are computed once
    (per-src window, never a global sort); each of the walk_len - 1
    steps is ONE equi-join of the live frontier against the indexed
    adjacency, checkpointed so lineage stays flat like the pagerank
    loop. Output: (start, walk, step, node), step 0-based.
    """
    from maps_spark.operators.dedup import P31
    from maps_spark.operators.corpus import _mix
    e = edges.select(F.col("src").cast("long"),
                     F.col("dst").cast("long")).distinct()
    w_adj = Window.partitionBy("src").orderBy("dst")
    adj = (e.withColumn("idx", F.row_number().over(w_adj) - 1)
           .localCheckpoint()
           .select(F.col("src").alias("asrc"), "dst", "idx"))
    deg = (adj.groupBy("asrc").agg(F.count("*").alias("d"))
           .withColumnRenamed("asrc", "dsrc")
           .localCheckpoint())
    # start set = every source node = distinct asrc of the already-
    # checkpointed adjacency; deriving it from ``e`` re-executed the
    # full upstream edge build (for the bench's interaction graph, a
    # second orders x lineitem join) — same set, one materialization
    # (guide §2.4: don't recompute what a checkpoint already holds).
    # deg is checkpointed for the same reason: it re-aggregated adj
    # once per walk step inside the loop joins.
    starts = deg.select(F.col("dsrc").alias("src"))
    frontier = (starts.select(
        F.col("src").alias("start"),
        F.explode(F.sequence(
            F.lit(0), F.lit(walks_per_node - 1))).alias("walk"))
        .withColumn("step", F.lit(0))
        .withColumn("node", F.col("start"))
        .localCheckpoint())
    out = frontier
    for t in range(1, walk_len):
        pick = _walk_pick(F.col("start"), F.col("walk"),
                          F.col("node"), t) % F.col("d")
        frontier = (frontier
                    .join(deg, F.col("node") == F.col("dsrc"))
                    .withColumn("pick", pick)
                    .join(adj, (F.col("node") == F.col("asrc"))
                          & (F.col("pick") == F.col("idx")))
                    .select("start", "walk",
                            (F.col("step") + 1).alias("step"),
                            F.col("dst").alias("node"))
                    .localCheckpoint())
        out = out.unionByName(frontier)
    return out.select("start", "walk",
                      F.col("step").cast("int").alias("step"), "node")


def random_walks_select(edges_cte: str, walk_len: int = 5,
                        walks_per_node: int = 2) -> str:
    """DuckDB twin of :func:`random_walks`: the walk recursion over
    ``edges_cte`` (a CTE body yielding integer (src, dst) rows) with
    the same neighbor ranking and mixer arithmetic."""
    from maps_spark.operators.corpus import mix_sql
    from maps_spark.operators.dedup import P31
    return f"""WITH RECURSIVE
eraw AS ({edges_cte}),
e AS (SELECT DISTINCT CAST(src AS BIGINT) AS src,
             CAST(dst AS BIGINT) AS dst FROM eraw),
adj AS (SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY dst) - 1
                 AS idx
        FROM e),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
        FROM e GROUP BY 1),
walk AS (
  SELECT src AS start, w AS walk, 0 AS step, src AS node
  FROM (SELECT DISTINCT src FROM e)
  CROSS JOIN generate_series(0, {walks_per_node - 1}) g(w)
  UNION ALL
  SELECT wk.start, wk.walk, wk.step + 1, a.dst
  FROM walk wk
  JOIN deg ON deg.src = wk.node
  JOIN adj a ON a.src = wk.node
   AND a.idx = {_walk_pick_sql("wk.start", "wk.walk",
                               "wk.node", "wk.step + 1")}
               % deg.d
  WHERE wk.step + 1 < {walk_len})
SELECT start, walk, CAST(step AS INT) AS step, node FROM walk"""


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(center, context) training pairs from random-walk sequences —
    the step that turns :func:`random_walks` output into a word2vec-
    style corpus: within each walk, every ordered pair of nodes at
    step distance 1..window. One self-equi-join on the walk key with
    a banded step predicate (the join keys carry (start, walk), so
    the band never degenerates into a cross join across walks).
    Output: (center, context, dist) with dist = |step gap|."""
    a = walks.select(F.col("start").alias("s"),
                     F.col("walk").alias("w"),
                     F.col("step").alias("step_a"),
                     F.col("node").alias("center"))
    b = walks.select(F.col("start").alias("s"),
                     F.col("walk").alias("w"),
                     F.col("step").alias("step_b"),
                     F.col("node").alias("context"))
    j = a.join(b, ["s", "w"])
    dist = F.abs(F.col("step_a") - F.col("step_b"))
    return (j.where((dist >= 1) & (dist <= window))
            .select("center", "context",
                    dist.cast("int").alias("dist")))


def skipgram_pairs_select(edges_cte: str, walk_len: int = 5,
                          walks_per_node: int = 2,
                          window: int = 2) -> str:
    """DuckDB twin of :func:`skipgram_pairs` over the same walks."""
    walks = random_walks_select(edges_cte, walk_len, walks_per_node)
    return f"""WITH w AS ({walks})
SELECT a.node AS center, b.node AS context,
       CAST(abs(a.step - b.step) AS INT) AS dist
FROM w a JOIN w b
  ON a.start = b.start AND a.walk = b.walk
WHERE abs(a.step - b.step) BETWEEN 1 AND {window}"""


def node2vec_walks(edges: DataFrame, walk_len: int = 4,
                   walks_per_node: int = 2,
                   wp: int = 1, w1: int = 4, wq: int = 2) -> DataFrame:
    """Deterministic node2vec walks (Grover & Leskovec 2016): the
    second-order biased sibling of :func:`random_walks`. Step 1 is
    uniform; from step 2 on, each neighbor x of the current node v
    with previous node t weighs ``wp`` if x == t (return), ``w1`` if
    x is also a neighbor of t (BFS-ish), else ``wq`` (DFS-ish) —
    integer weights standing in for the paper's 1/p, 1, 1/q. The
    draw picks the dst-ordered neighbor whose cumulative weight
    interval contains mix(v, start, walk, step) mod total — int64-exact,
    so the unrolled SQL twin replays every pick bitwise.

    Per step: one equi-join to expand the frontier's neighbors, one
    LEFT join against the edge set for the common-neighbor flag, and
    one per-(start, walk) window for the cumulative draw; the
    frontier is checkpointed per step like the other iterative graph
    operators. Output: (start, walk, step, node)."""
    from maps_spark.operators.corpus import _mix
    from maps_spark.operators.dedup import P31
    e = (edges.select(F.col("src").cast("long"),
                      F.col("dst").cast("long"))
         .distinct().localCheckpoint())
    adj = e.select(F.col("src").alias("asrc"),
                   F.col("dst").alias("nxt"))
    w_adj = Window.partitionBy("asrc").orderBy("nxt")
    idx_adj = adj.withColumn("idx", F.row_number().over(w_adj) - 1)
    deg = adj.groupBy("asrc").agg(F.count("*").alias("d")) \
        .withColumnRenamed("asrc", "dsrc")
    pflag = e.select(F.col("src").alias("psrc"),
                     F.col("dst").alias("pnxt"),
                     F.lit(1).alias("is_nbr"))
    starts = e.select("src").distinct()
    frontier = (starts.select(
        F.col("src").alias("start"),
        F.explode(F.sequence(
            F.lit(0), F.lit(walks_per_node - 1))).alias("walk"))
        .withColumn("step", F.lit(0))
        .withColumn("prev", F.lit(None).cast("long"))
        .withColumn("node", F.col("start"))
        .localCheckpoint())
    out = frontier.select("start", "walk", "step", "node")
    if walk_len > 1:  # step 1: uniform first-order pick
        pick = _walk_pick(F.col("start"), F.col("walk"),
                          F.col("node"), 1) % F.col("d")
        frontier = (frontier
                    .join(deg, F.col("node") == F.col("dsrc"))
                    .withColumn("pick", pick)
                    .join(idx_adj, (F.col("node") == F.col("asrc"))
                          & (F.col("pick") == F.col("idx")))
                    .select("start", "walk", F.lit(1).alias("step"),
                            F.col("node").alias("prev"),
                            F.col("nxt").alias("node"))
                    .localCheckpoint())
        out = out.unionByName(
            frontier.select("start", "walk", "step", "node"))
    for t in range(2, walk_len):
        cand = (frontier.join(adj, F.col("node") == F.col("asrc"))
                .join(pflag, (F.col("prev") == F.col("psrc"))
                      & (F.col("nxt") == F.col("pnxt")), "left"))
        wt = (F.when(F.col("nxt") == F.col("prev"), wp)
              .when(F.col("is_nbr") == 1, w1)
              .otherwise(wq)).cast("long")
        w_cum = (Window.partitionBy("start", "walk").orderBy("nxt")
                 .rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))
        w_tot = Window.partitionBy("start", "walk")
        cand = (cand.withColumn("wt", wt)
                .withColumn("cum", F.sum("wt").over(w_cum))
                .withColumn("tot", F.sum("wt").over(w_tot)))
        r = _walk_pick(F.col("start"), F.col("walk"),
                       F.col("node"), t) % F.col("tot")
        frontier = (cand.withColumn("r", r)
                    .where((F.col("cum") > F.col("r"))
                           & (F.col("cum") - F.col("wt")
                              <= F.col("r")))
                    .select("start", "walk", F.lit(t).alias("step"),
                            F.col("node").alias("prev"),
                            F.col("nxt").alias("node"))
                    .localCheckpoint())
        out = out.unionByName(
            frontier.select("start", "walk", "step", "node"))
    return out.select("start", "walk",
                      F.col("step").cast("int").alias("step"), "node")


def node2vec_walks_select(edges_cte: str, walk_len: int = 4,
                          walks_per_node: int = 2, wp: int = 1,
                          w1: int = 4, wq: int = 2) -> str:
    """DuckDB twin of :func:`node2vec_walks`: the step loop unrolled
    into chained CTEs, each with the same common-neighbor flag,
    cumulative-weight window, and mixer draw."""
    from maps_spark.operators.corpus import mix_sql
    from maps_spark.operators.dedup import P31
    ctes = [f"eraw AS ({edges_cte})",
            "e AS (SELECT DISTINCT CAST(src AS BIGINT) AS src, "
            "CAST(dst AS BIGINT) AS dst FROM eraw)",
            "adjn AS (SELECT src AS asrc, dst AS nxt, "
            "row_number() OVER (PARTITION BY src ORDER BY dst) - 1 "
            "AS idx FROM e)",
            "deg AS (SELECT src AS dsrc, CAST(count(*) AS BIGINT) "
            "AS d FROM e GROUP BY 1)",
            f"""s0 AS (
  SELECT src AS start, w AS walk, 0 AS step,
         CAST(NULL AS BIGINT) AS prev, src AS node
  FROM (SELECT DISTINCT src FROM e)
  CROSS JOIN generate_series(0, {walks_per_node - 1}) g(w))"""]
    if walk_len > 1:
        ctes.append(f"""s1 AS (
  SELECT s.start, s.walk, 1 AS step, s.node AS prev, a.nxt AS node
  FROM s0 s
  JOIN deg ON deg.dsrc = s.node
  JOIN adjn a ON a.asrc = s.node
   AND a.idx = {_walk_pick_sql("s.start", "s.walk",
                               "s.node", "1")} % deg.d)""")
    for t in range(2, walk_len):
        ctes.append(f"""s{t} AS (
  SELECT start, walk, {t} AS step, node AS prev, nxt AS node FROM (
    SELECT q.*,
           {_walk_pick_sql("q.start", "q.walk",
                           "q.node", t)} % q.tot AS r
    FROM (
      SELECT s.start, s.walk, s.node, a.nxt, wts.wt,
             sum(wts.wt) OVER (PARTITION BY s.start, s.walk
               ORDER BY a.nxt ROWS UNBOUNDED PRECEDING) AS cum,
             sum(wts.wt) OVER (PARTITION BY s.start, s.walk) AS tot
      FROM s{t - 1} s
      JOIN adjn a ON a.asrc = s.node
      LEFT JOIN (SELECT src AS psrc, dst AS pnxt, 1 AS is_nbr
                 FROM e) p
        ON p.psrc = s.prev AND p.pnxt = a.nxt
      CROSS JOIN LATERAL (SELECT CAST(CASE
            WHEN a.nxt = s.prev THEN {wp}
            WHEN p.is_nbr = 1 THEN {w1}
            ELSE {wq} END AS BIGINT) AS wt) wts) q) q2
  WHERE cum > r AND cum - wt <= r)""")
    union = "\nUNION ALL\n".join(
        f"SELECT start, walk, step, node FROM s{t}"
        for t in range(walk_len))
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT start, walk, CAST(step AS INT) AS step, "
              f"node FROM ({union})")
