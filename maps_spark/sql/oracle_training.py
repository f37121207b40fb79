"""DuckDB oracles for the training-data pipeline operators."""

from __future__ import annotations

from maps_spark.operators.text import STOPWORDS, lang_id_sql, occurrences_sql


def dedup_exact_select() -> str:
    return """SELECT md5(text) AS text_hash, count(*) AS n_dupes,
       min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1"""


def dedup_prefix_select(n_tokens: int = 10) -> str:
    return f"""SELECT array_to_string((string_split(text, ' '))[1:{n_tokens}],
                       ' ') AS prefix,
       count(*) AS n_dupes, min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1"""


def text_stats_select() -> str:
    padded = "(' ' || text || ' ')"
    n_stop = " + ".join(occurrences_sql(padded, t) for t in STOPWORDS)
    return f"""SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST((length(text) - length(replace(text, ' ', ''))) AS BIGINT) + 1
    AS n_tokens,
  {n_stop} AS n_stopwords,
  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
  CAST(length(text) AS DOUBLE) /
    CAST(CAST((length(text) - length(replace(text, ' ', ''))) AS BIGINT) + 1
         AS DOUBLE) AS mean_token_len
FROM documents"""


def lang_id_select() -> str:
    return lang_id_sql("FROM documents")


def quality_score_select(min_tokens: int = 16,
                         max_mean_token_len: float = 12.0) -> str:
    ratio = "CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE)"
    return f"""WITH f AS ({text_stats_select()})
SELECT doc_id, n_tokens, mean_token_len,
       {ratio} AS stopword_ratio,
       (n_tokens >= {min_tokens}
        AND mean_token_len <= {max_mean_token_len}
        AND {ratio} > 0.001) AS keep
FROM f"""


def token_count_select() -> str:
    from maps_spark.operators.text import BPE_PATTERN
    # RE2 needs the same pattern; len(regexp_extract_all) == match count
    pat = BPE_PATTERN.replace("'", "''")
    return f"""SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_bpe_tokens,
  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
    AS n_ws_tokens
FROM documents"""


def ngram_jaccard_select(shingle_k: int = 3, threshold: float = 0.25,
                         scale: int = 1_000_000, max_df: int = 1000) -> str:
    """Exact shingle Jaccard pairs; docs assumed >= k tokens (true for
    the synthetic corpus; asserted in tests). Mirrors the engine's
    hot-shingle guard: shingles with document frequency > max_df are
    excluded from both the intersection and the set sizes."""
    return f"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[i:i+{shingle_k - 1}], ' ') AS shingle
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - {shingle_k - 1}, 1)))
                 AS i
        FROM toks) s),
sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle NOT IN (SELECT shingle FROM sh0
                        GROUP BY 1 HAVING count(*) > {max_df})),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, inter,
       sa.sz + sb.sz - inter AS uni,
       CAST(floor(CAST(inter * {scale} AS DOUBLE) /
                  CAST(sa.sz + sb.sz - inter AS DOUBLE)) AS BIGINT)
         AS jaccard_scaled
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(floor(CAST(inter * {scale} AS DOUBLE) /
                 CAST(sa.sz + sb.sz - inter AS DOUBLE)) AS BIGINT)
      >= {int(threshold * scale)}"""


_DOT = ("list_reduce(list_transform(list_zip({a}, {b}), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (s, v) -> s + v)")
_NORM = ("sqrt(list_reduce(list_transform({a}, "
         "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (s, v) -> s + v))")


def ann_topk_select(k: int = 10, n_queries: int = 16) -> str:
    """Exact cosine top-k for query vectors (vec_id < n_queries)."""
    dot = _DOT.format(a="q.embedding", b="c.embedding")
    na = _NORM.format(a="q.embedding")
    nb = _NORM.format(a="c.embedding")
    return f"""WITH q AS (SELECT vec_id, embedding FROM embeddings
           WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(floor(({dot}) / (({na}) * ({nb})) * 1000000000.0) AS BIGINT)
           AS cos_scaled
  FROM embeddings c, q WHERE c.vec_id <> q.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_scaled,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_scaled DESC, neighbor_id)
           AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_scaled
FROM ranked WHERE rank <= {k}"""
