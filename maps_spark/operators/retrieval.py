"""BM25 full-text retrieval over the document corpus.

Query-targeted corpus selection is a standard training-data stage
(fetch the documents most relevant to a benchmark/topic seed — the
lexical complement of the DSIR importance sampler in
:mod:`maps_spark.operators.corpus`), and BM25 (Robertson-Sparck
Jones / Okapi, public since TREC-3) is its workhorse scorer.

Determinism/oracle discipline:

- every per-(query, doc, term) BM25 contribution is computed by ONE
  shared SQL expression template (``BM25_TERM_SQL`` — ln / + / * / /
  behave identically in Spark SQL and DuckDB per the dual.py rules)
  and floor-scaled to an integer BEFORE the per-document sum, so the
  aggregation is order-insensitive integer addition (the
  ``sum_stable`` rule) and the gate hash-matches bitwise;
- ``N`` (corpus size) and ``T`` (total tokens) enter as exact
  integers (driver literals on the Spark side, scalar subqueries in
  the oracle) — equal values through identical double arithmetic.

Scale shape: the corpus side builds the classic inverted structures
(tf postings, doc lengths, document frequencies) with map-side
combined aggregations; the query-term table is tiny and broadcast, so
scoring is a hash-join probe of the postings — O(sum of posting-list
lengths of the query terms), never a corpus scan per query. Top-k is
a per-query window over scored candidates only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

K1, B = 1.2, 0.75
SCALE = 1_000_000

# shared dual-dialect term scorer over columns (tf, df, dl) and the
# injected N/T/k1/b constants; floor-scaled to BIGINT per term
BM25_TERM_SQL = (
    "CAST(floor((ln((({nd}) - CAST(df AS DOUBLE) + 0.5)"
    " / (CAST(df AS DOUBLE) + 0.5) + 1.0)"
    " * (CAST(tf AS DOUBLE) * ({k1} + 1.0))"
    " / (CAST(tf AS DOUBLE) + {k1} * (1.0 - {b} + {b}"
    " * (CAST(dl AS DOUBLE) * ({nd}) / ({tt}))))) * {scale}.0)"
    " AS BIGINT)")


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = K1, b: float = B,
              text_col: str = "text", id_col: str = "doc_id",
              qid_col: str = "query_id", qtext_col: str = "text",
              scale: int = SCALE) -> DataFrame:
    """Top-k documents per query by BM25 (distinct query terms, the
    standard short-query form). Ties break on doc_id ascending; a
    query with no indexed term emits no rows.

    Output: (query_id, doc_id, score_scaled, rank), rank <= k.
    """
    from maps_spark.operators.text import _doc_tokens
    toks = _doc_tokens(docs.select(F.col(id_col).alias("doc_id"),
                                   F.col(text_col).alias("text")),
                       "text")
    # corpus passes are bounded at TWO: one driver agg gets both
    # constants in a single scan (counting tokens with the same
    # nonempty-split rule _doc_tokens applies), and the tf table —
    # the shared parent of dl / df / the scoring probe — is
    # checkpointed so its tokenize+aggregate lineage runs once
    nd, tt = docs.agg(
        F.count("*"),
        F.coalesce(F.sum(F.size(F.filter(
            F.split(F.col(text_col), " "),
            lambda w: w != ""))), F.lit(0))).first()
    if not tt:  # degenerate corpus (all docs empty/whitespace):
        # tt would be a 0 divisor in the dl*nd/tt term; no document
        # can match any term, so the result is exactly empty
        return docs.sparkSession.createDataFrame(
            [], "query_id long, doc_id long, score_scaled long, "
                "rank int")
    tf = (toks.groupBy("doc_id", "word")
          .agg(F.count("*").alias("tf")).localCheckpoint())
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("word").agg(F.count("*").alias("df"))
    qterms = queries.select(
        F.col(qid_col).alias("query_id"),
        F.explode(F.array_distinct(F.filter(
            F.split(F.col(qtext_col), " "),
            lambda w: w != ""))).alias("word"))
    term = F.expr(BM25_TERM_SQL.format(
        nd=float(nd), tt=float(tt), k1=float(k1), b=float(b),
        scale=int(scale)))
    scored = (tf.join(F.broadcast(qterms), "word")
              .join(F.broadcast(dfreq.join(
                  F.broadcast(qterms.select("word").distinct()),
                  "word")), "word")
              .join(dl, "doc_id")
              .select("query_id", "doc_id", term.alias("t"))
              .groupBy("query_id", "doc_id")
              .agg(F.sum("t").cast("long").alias("score_scaled")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_scaled"), "doc_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def bm25_topk_select(k: int = 10, n_queries: int = 8,
                     q_words: int = 6, k1: float = K1, b: float = B,
                     scale: int = SCALE) -> str:
    """DuckDB twin of bm25_topk with queries = the first ``q_words``
    words of documents doc_id < n_queries (the gate configuration)."""
    nd = "CAST((SELECT c FROM ndc) AS DOUBLE)"
    tt = "CAST((SELECT c FROM ttc) AS DOUBLE)"
    term = BM25_TERM_SQL.format(nd=nd, tt=tt, k1=float(k1),
                                b=float(b), scale=int(scale))
    return f"""WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS word
  FROM documents),
tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
dfq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
ndc AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
ttc AS (SELECT CAST(count(*) AS BIGINT) AS c FROM toks),
qt AS (
  SELECT doc_id AS query_id,
         unnest(list_distinct(
             (list_filter(string_split(text, ' '),
                          x -> x <> ''))[1:{q_words}])) AS word
  FROM documents WHERE doc_id < {n_queries}),
terms AS (
  SELECT q.query_id, t.doc_id, {term} AS ts
  FROM qt q
  JOIN tf t USING (word) JOIN dfq USING (word)
  JOIN dl ON dl.doc_id = t.doc_id),
scored AS (
  SELECT query_id, doc_id, CAST(sum(ts) AS BIGINT) AS score_scaled
  FROM terms GROUP BY 1, 2)
SELECT query_id, doc_id, score_scaled,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY score_scaled DESC, doc_id)
            AS INT) AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY score_scaled DESC, doc_id)
        <= {k}"""


# gate configuration — single-sourced for the Spark query, the DuckDB
# oracle defaults, the bench entry and the tests (changing one side
# without the other would make the gate diverge with no pointer why)
GATE_N_QUERIES, GATE_Q_WORDS, GATE_K = 8, 6, 10


def probe_queries(docs: DataFrame, n_queries: int = GATE_N_QUERIES,
                  q_words: int = GATE_Q_WORDS,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """The gate/bench query builder: the first ``q_words`` nonempty
    words of the ``n_queries`` lowest-id documents."""
    return (docs.where(F.col(id_col) < n_queries)
            .select(F.col(id_col).alias("query_id"),
                    F.array_join(F.slice(F.filter(
                        F.split(F.col(text_col), " "),
                        lambda w: w != ""), 1, q_words), " ")
                    .alias("text")))


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of lexical + dense lists
# ---------------------------------------------------------------------------

RRF_K0 = 60          # the constant of Cormack/Clarke/Buettcher 2009
RRF_SCALE = 1_000_000


def rrf_fuse(lists: list[DataFrame], k0: int = RRF_K0,
             scale: int = RRF_SCALE) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR
    2009) of any number of (query_id, doc_id, rank) result lists —
    the standard way to combine BM25 and dense-ANN retrieval without
    score calibration. Contribution of a list placing d at rank r is
    the exact integer ``scale div (k0 + r)``, summed per (query, doc)
    (order-insensitive integer addition — the ``sum_stable`` rule),
    then re-ranked per query (ties break on doc_id).

    Scale: a union + one (query_id, doc_id) aggregation over lists
    that are already top-k-bounded per query — the fused set is
    O(n_queries * k * n_lists) regardless of corpus size; the window
    runs per query over <= k * n_lists rows.

    Output: (query_id, doc_id, rrf_scaled, n_lists, rank)."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one result list")
    u = lists[0].select("query_id", "doc_id", "rank")
    for df in lists[1:]:
        u = u.unionByName(df.select("query_id", "doc_id", "rank"))
    agg = (u.select("query_id", "doc_id",
                    F.expr(f"{int(scale)} div ({int(k0)} + rank)")
                    .cast("long").alias("c"))
           .groupBy("query_id", "doc_id")
           .agg(F.sum("c").cast("long").alias("rrf_scaled"),
                F.count("*").cast("long").alias("n_lists")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_scaled"), "doc_id")
    return agg.withColumn("rank", F.row_number().over(w))


def hybrid_rrf_select(k: int = GATE_K, n_queries: int = GATE_N_QUERIES,
                      q_words: int = GATE_Q_WORDS, k0: int = RRF_K0,
                      scale: int = RRF_SCALE) -> str:
    """DuckDB twin of the hybrid gate: rrf_fuse over the bm25_topk
    oracle and the exact-cosine ann_topk oracle (both verbatim, as
    their own gates run them)."""
    from maps_spark.sql.oracle_training import ann_topk_select
    bm25 = bm25_topk_select(k=k, n_queries=n_queries, q_words=q_words)
    ann = ann_topk_select(k=k, n_queries=n_queries)
    return f"""WITH bm AS ({bm25}),
an AS ({ann}),
u AS (
  SELECT query_id, doc_id, rank FROM bm
  UNION ALL
  SELECT query_id, neighbor_id AS doc_id, rank FROM an),
agg AS (
  SELECT query_id, doc_id,
         CAST(sum({int(scale)} // ({int(k0)} + rank)) AS BIGINT)
           AS rrf_scaled,
         CAST(count(*) AS BIGINT) AS n_lists
  FROM u GROUP BY 1, 2)
SELECT query_id, doc_id, rrf_scaled, n_lists,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_scaled DESC, doc_id)
            AS INT) AS rank
FROM agg"""
