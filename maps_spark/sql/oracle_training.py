"""DuckDB oracles for the training-data pipeline operators."""

from __future__ import annotations

from maps_spark.operators.text import STOPWORDS, lang_id_sql, occurrences_sql


def dedup_exact_select() -> str:
    # seeded byte-identical pairs mirror plans.queries.q_dedup_exact
    # (the raw corpus has none, and a 0-row gate certifies only the
    # negative path)
    return """WITH seeded AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents
  WHERE doc_id < 3)
SELECT md5(text) AS text_hash, count(*) AS n_dupes,
       min(doc_id) AS keeper_doc_id
FROM seeded GROUP BY 1 HAVING count(*) > 1"""


def dedup_prefix_select(n_tokens: int = 10) -> str:
    return f"""SELECT array_to_string((string_split(text, ' '))[1:{n_tokens}],
                       ' ') AS prefix,
       count(*) AS n_dupes, min(doc_id) AS keeper_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1"""


def source_divergence_select(vocab_k: int = 200) -> str:
    """Integer-exact total-variation distance per source vs the corpus
    over the top-k vocab (operators.corpus.source_divergence twin)."""
    return f"""WITH toks AS (
  SELECT source AS src, unnest(string_split(text, ' ')) AS word
  FROM documents),
corpus AS (
  SELECT word, count(*) AS c_c FROM toks
  GROUP BY 1 ORDER BY c_c DESC, word LIMIT {vocab_k}),
per_src AS (
  SELECT src, word, count(*) AS c_s FROM toks
  WHERE word IN (SELECT word FROM corpus) GROUP BY 1, 2),
totals AS (SELECT src, sum(c_s) AS n_s FROM per_src GROUP BY 1),
nc AS (SELECT sum(c_c) AS n_c FROM corpus),
grid AS (
  SELECT t.src, t.n_s, c.word, c.c_c, coalesce(p.c_s, 0) AS c_s, nc.n_c
  FROM corpus c CROSS JOIN totals t CROSS JOIN nc
  LEFT JOIN per_src p ON p.src = t.src AND p.word = c.word)
SELECT src AS source, CAST(n_s AS BIGINT) AS n_tokens_vocab,
       CAST(sum(abs(c_s * n_c - c_c * n_s)) AS BIGINT) AS tv_num,
       CAST(2 * n_s * n_c AS BIGINT) AS tv_denom
FROM grid GROUP BY src, n_s, n_c"""


def _para_docs_cte() -> str:
    """Derived multi-paragraph corpus: 8-token chunks joined on blank
    lines — the DuckDB mirror of plans.queries._para_docs."""
    return """pdocs AS (
  SELECT doc_id,
         array_to_string(
           list_transform(
             generate_series(0, (len(string_split(text, ' ')) - 1) // 8),
             i -> array_to_string(string_split(text, ' ')[i*8+1:i*8+8],
                                  ' ')),
           chr(10) || chr(10)) AS text
  FROM documents)"""


def _paras_cte() -> str:
    return """paras AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, chr(10)||chr(10)), 1) - 1
           AS para_idx,
         unnest(string_split(text, chr(10)||chr(10))) AS para
  FROM pdocs)"""


def para_dedup_select(min_chars: int = 1) -> str:
    """Canonical-first paragraph dedup verdicts (operators.dedup.
    paragraph_dedup twin): lexicographic-min (doc_id, para_idx) per
    exact paragraph text is canonical; everything else is a dup."""
    dup = (f"(length(p.para) >= {min_chars} "
           "AND NOT (p.doc_id = c2.cd AND p.para_idx = c2.ci))")
    return f"""WITH {_para_docs_cte()},
{_paras_cte()},
c1 AS (SELECT md5(para) AS ph, min(doc_id) AS cd FROM paras GROUP BY 1),
c2 AS (SELECT c1.ph, c1.cd, min(p.para_idx) AS ci
       FROM paras p JOIN c1 ON md5(p.para) = c1.ph AND p.doc_id = c1.cd
       GROUP BY 1, 2)
SELECT p.doc_id, CAST(p.para_idx AS INT) AS para_idx,
       {dup} AS is_dup,
       CASE WHEN {dup} THEN c2.cd ELSE -1 END AS dup_of_doc,
       CAST(CASE WHEN {dup} THEN c2.ci ELSE -1 END AS INT) AS dup_of_idx
FROM paras p JOIN c2 ON md5(p.para) = c2.ph"""


def para_clean_select(min_chars: int = 1) -> str:
    """Documents rebuilt without duplicate paragraphs
    (operators.dedup.drop_dup_paragraphs twin)."""
    dup = (f"(length(p.para) >= {min_chars} "
           "AND NOT (p.doc_id = c2.cd AND p.para_idx = c2.ci))")
    return f"""WITH {_para_docs_cte()},
{_paras_cte()},
c1 AS (SELECT md5(para) AS ph, min(doc_id) AS cd FROM paras GROUP BY 1),
c2 AS (SELECT c1.ph, c1.cd, min(p.para_idx) AS ci
       FROM paras p JOIN c1 ON md5(p.para) = c1.ph AND p.doc_id = c1.cd
       GROUP BY 1, 2)
SELECT p.doc_id,
       string_agg(p.para, chr(10)||chr(10) ORDER BY p.para_idx)
         AS clean_text
FROM paras p JOIN c2 ON md5(p.para) = c2.ph
WHERE NOT {dup}
GROUP BY p.doc_id"""


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


def quality_ensemble_select(weights: dict[str, int],
                            group_col: str = "source") -> str:
    """DuckDB twin of operators.text.quality_ensemble over the
    text_stats signals joined with the grouping column."""
    padded = "(' ' || text || ' ')"
    n_stop = " + ".join(occurrences_sql(padded, t) for t in STOPWORDS)
    terms = " + ".join(
        f"percent_rank() OVER (PARTITION BY {group_col} ORDER BY {c})"
        f" * {int(weights[c])}"
        for c in sorted(weights))
    return f"""WITH sigs AS (
  SELECT doc_id, {group_col},
         CAST((length(text) - length(replace(text, ' ', '')))
              AS BIGINT) + 1 AS n_tokens,
         {n_stop} AS n_stopwords
  FROM documents)
SELECT doc_id, {group_col},
       CAST(floor({terms}) AS BIGINT) AS score_scaled
FROM sigs"""


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


def jaccard_prefix_select(shingle_k: int = 3, threshold: float = 0.25,
                          scale: int = 1_000_000) -> str:
    """Oracle for the prefix-filtered exact similarity join: plain
    all-pairs shingle Jaccard with NO cap and NO pruning — prefix
    filtering is lossless, so the engine's pruned plan must reproduce
    the brute-force answer bit for bit."""
    return f"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[i:i+{shingle_k - 1}], ' ') AS shingle
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - {shingle_k - 1}, 1)))
                 AS i
        FROM toks) s),
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


def dedup_clusters_select(shingle_k: int = 3, threshold: float = 0.25,
                          scale: int = 1_000_000,
                          max_df: int = 1000) -> str:
    """DuckDB twin of operators.dedup.dedup_clusters over the exact
    n-gram Jaccard pairs: connected components via a recursive CTE —
    each node's component label is the minimum doc_id reachable along
    pair edges (labels propagate only downward, so the recursion's
    UNION-dedup terminates)."""
    pairs = ngram_jaccard_select(shingle_k, threshold, scale, max_df)
    return f"""WITH RECURSIVE pr AS ({pairs}),
edges AS (SELECT doc_a AS s, doc_b AS d FROM pr
          UNION ALL SELECT doc_b, doc_a FROM pr),
nodes AS (SELECT DISTINCT s AS doc_id FROM edges),
walk(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.d, w.lbl FROM walk w JOIN edges e ON e.s = w.doc_id
  WHERE w.lbl < e.d),
comp AS (SELECT doc_id, min(lbl) AS cluster_id FROM walk GROUP BY 1),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1)
SELECT c.doc_id, c.cluster_id, s.cluster_size,
       (c.doc_id = c.cluster_id) AS keep
FROM comp c JOIN sizes s USING (cluster_id)"""


def soft_dedup_weights_select(shingle_k: int = 3,
                              threshold: float = 0.25,
                              jscale: int = 1_000_000,
                              max_df: int = 1000,
                              scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.dedup.soft_dedup_weights over the
    exact-Jaccard clusters: the dedup_clusters recursive chain
    extended with the weight join (WITH RECURSIVE must stay
    top-level, so the chain is re-used by string surgery rather than
    nesting)."""
    base = dedup_clusters_select(shingle_k, threshold, jscale, max_df)
    head, _tail = base.rsplit("SELECT c.doc_id", 1)
    return head.rstrip() + f""",
cl AS (
  SELECT c.doc_id, s.cluster_size
  FROM comp c JOIN sizes s USING (cluster_id))
SELECT d.doc_id,
       CAST(coalesce(cl.cluster_size, 1) AS BIGINT) AS cluster_size,
       CAST({scale} // coalesce(cl.cluster_size, 1) AS BIGINT)
         AS weight_scaled
FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id"""


def weighted_sample_select(rate: float = 0.5,
                           shingle_k: int = 3,
                           threshold: float = 0.25,
                           jscale: int = 1_000_000,
                           max_df: int = 1000,
                           scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.mixture.weighted_sample over
    soft_dedup_weights: the weight query with the mix-threshold
    filter appended (weight recomputed in WHERE — recursive CTEs
    cannot nest)."""
    from maps_spark.operators.corpus import P31, mix_sql
    base = soft_dedup_weights_select(shingle_k, threshold, jscale,
                                     max_df, scale)
    w = f"CAST({scale} // coalesce(cl.cluster_size, 1) AS BIGINT)"
    return (base + f"""
WHERE {mix_sql('d.doc_id')} < ({int(rate * P31)} * {w}) // {scale}""")


def _shingle_cte(table: str, shingle_k: int) -> str:
    """Distinct string k-token shingles per doc (same construction as
    operators.dedup._shingle_array: docs shorter than k collapse to one
    whole-text shingle)."""
    return f"""(SELECT DISTINCT doc_id,
         array_to_string(t[i:i+{shingle_k - 1}], ' ') AS shingle
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - {shingle_k - 1}, 1)))
                 AS i
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM {table}) tk)
       s)"""


def contamination_select(bench_mod: int = 25, shingle_k: int = 3,
                         scale: int = 1_000_000,
                         threshold: float = 0.2) -> str:
    """DuckDB twin of operators.corpus.contamination_check with the
    benchmark split used by plans.queries.q_contamination
    (doc_id % bench_mod == 0 is the benchmark; the rest is corpus)."""
    return f"""WITH doc_sh AS (
  SELECT * FROM {_shingle_cte(
      f"(SELECT * FROM documents WHERE doc_id % {bench_mod} <> 0)",
      shingle_k)} x),
bench_sh AS (
  SELECT DISTINCT shingle FROM {_shingle_cte(
      f"(SELECT * FROM documents WHERE doc_id % {bench_mod} = 0)",
      shingle_k)} y),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM doc_sh GROUP BY 1),
hits AS (
  SELECT doc_id, count(*) AS n_contaminated FROM doc_sh
  WHERE shingle IN (SELECT shingle FROM bench_sh) GROUP BY 1)
SELECT s.doc_id, s.n_shingles,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       CAST(floor(COALESCE(h.n_contaminated, 0) * {scale} /
                  s.n_shingles) AS BIGINT) AS contamination_scaled,
       CAST(floor(COALESCE(h.n_contaminated, 0) * {scale} /
                  s.n_shingles) AS BIGINT) >= {int(threshold * scale)}
         AS flagged
FROM sizes s LEFT JOIN hits h USING (doc_id)"""


_TOKS_CTE = """toks AS (
  SELECT doc_id, word, pos FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM documents) s
  WHERE word <> '')"""


def repetition_select(scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.text.repetition_signals."""
    return f"""WITH {_TOKS_CTE},
wc AS (SELECT doc_id, word, count(*) AS cnt FROM toks GROUP BY 1, 2),
words AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
         count(*) AS n_distinct_words, max(cnt) AS top_word_cnt
  FROM wc GROUP BY 1),
big AS (
  SELECT doc_id, word || ' ' || nxt AS bigram FROM (
    SELECT doc_id, word,
           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
    FROM toks) b WHERE nxt IS NOT NULL),
bg AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         max(cnt) AS top_bigram_cnt
  FROM (SELECT doc_id, bigram, count(*) AS cnt FROM big GROUP BY 1, 2) c
  GROUP BY 1),
runs AS (
  SELECT doc_id, max(run_len) AS max_word_run FROM (
    SELECT doc_id, run_id, count(*) AS run_len FROM (
      SELECT doc_id,
             sum(new_run) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
      FROM (SELECT doc_id, pos,
                   CASE WHEN lag(word) OVER (PARTITION BY doc_id
                                             ORDER BY pos) IS DISTINCT
                             FROM word THEN 1 ELSE 0 END AS new_run
            FROM toks) f) g
    GROUP BY 1, 2) h
  GROUP BY 1)
SELECT w.doc_id, w.n_words, w.n_distinct_words,
       CAST(floor((w.n_words - w.n_distinct_words) * {scale}
                  / w.n_words) AS BIGINT) AS dup_word_frac_scaled,
       CAST(floor(w.top_word_cnt * {scale} / w.n_words) AS BIGINT)
         AS top_word_frac_scaled,
       COALESCE(CAST(floor(b.top_bigram_cnt * {scale} / b.n_bigrams)
                     AS BIGINT), 0) AS top_bigram_frac_scaled,
       r.max_word_run
FROM words w LEFT JOIN bg b USING (doc_id) JOIN runs r USING (doc_id)"""


def tf_idf_select(top_k: int = 5) -> str:
    """DuckDB twin of operators.text.tf_idf — same expression order in
    the float product so ``floor`` cuts identically."""
    return f"""WITH {_TOKS_CTE},
tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, word, tf, df,
         CAST(floor(1000000.0 * CAST(tf AS DOUBLE)
                    * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)))
              AS BIGINT) AS tfidf_scaled
  FROM tf JOIN dfreq USING (word) CROSS JOIN n)
SELECT doc_id, word, tf, df, tfidf_scaled, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf_scaled DESC, word) AS rank
      FROM scored) t
WHERE rank <= {top_k}"""


def top_ngrams_select(n: int = 2, k: int = 50) -> str:
    """DuckDB twin of operators.corpus.top_ngrams."""
    parts = ["word"] + [
        f"lead(word, {i}) OVER (PARTITION BY doc_id ORDER BY pos)"
        for i in range(1, n)]
    gram = " || ' ' || ".join(parts)
    last = (f"lead(word, {n - 1}) OVER (PARTITION BY doc_id ORDER BY pos)"
            if n > 1 else "word")
    return f"""WITH {_TOKS_CTE},
grams AS (
  SELECT doc_id, ngram FROM (
    SELECT doc_id, {gram} AS ngram, {last} AS last FROM toks) g
  WHERE last IS NOT NULL)
SELECT ngram, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
FROM grams GROUP BY 1
ORDER BY n_occ DESC, ngram LIMIT {k}"""


def pii_scrub_select() -> str:
    """DuckDB twin of operators.text.pii_scrub (same pattern order)."""
    from maps_spark.operators.text import PII_PATTERNS
    scrub = "text"
    counts = []
    for name, pat in PII_PATTERNS:
        esc = pat.replace("'", "''")  # SQL strings keep backslashes literal
        counts.append(f"CAST(len(regexp_extract_all(text, '{esc}')) "
                      f"AS BIGINT) AS n_{name}")
        scrub = f"regexp_replace({scrub}, '{esc}', '<{name.upper()}>', 'g')"
    return (f"SELECT doc_id, {scrub} AS scrubbed, {', '.join(counts)} "
            f"FROM documents")


def build_vocab_select(min_count: int = 1) -> str:
    """DuckDB twin of operators.corpus.build_vocab."""
    return f"""WITH {_TOKS_CTE},
counts AS (
  SELECT word, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
  FROM toks GROUP BY 1 HAVING count(*) >= {min_count})
SELECT word, n_occ, n_docs,
       row_number() OVER (ORDER BY n_occ DESC, word) - 1 AS token_id
FROM counts"""


def tokenize_docs_select(min_count: int = 1, unk_id: int = -1) -> str:
    """DuckDB twin of operators.corpus.tokenize_docs (vocab derived by
    the same (n_occ DESC, word) ranking as build_vocab_select)."""
    return f"""WITH {_TOKS_CTE},
counts AS (
  SELECT word, count(*) AS n_occ
  FROM toks GROUP BY 1 HAVING count(*) >= {min_count}),
vocab AS (
  SELECT word, row_number() OVER (ORDER BY n_occ DESC, word) - 1 AS token_id
  FROM counts),
j AS (
  SELECT t.doc_id, t.pos, v.token_id
  FROM toks t LEFT JOIN vocab v USING (word))
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       string_agg(CAST(coalesce(token_id, {unk_id}) AS VARCHAR),
                  ',' ORDER BY pos) AS token_ids
FROM j GROUP BY 1"""


def corpus_diff_select() -> str:
    """DuckDB twin of operators.corpus.corpus_diff over the gate's
    synthetic snapshot pair (old = doc_id % 7 <> 0; new = doc_id % 5
    <> 0 with text revised when doc_id % 11 = 0)."""
    return """WITH o AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0),
n AS (
  SELECT doc_id, md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
                          ELSE text END) AS h
  FROM documents WHERE doc_id % 5 <> 0),
j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, o.h AS ho, n.h AS hn
  FROM o FULL JOIN n ON o.doc_id = n.doc_id)
SELECT doc_id,
       CASE WHEN ho IS NULL THEN 'added'
            WHEN hn IS NULL THEN 'removed'
            WHEN ho <> hn THEN 'changed' END AS change
FROM j
WHERE ho IS NULL OR hn IS NULL OR ho <> hn"""


def corpus_profile_select(value_col: str = "n_chars",
                          group_col: str = "source") -> str:
    """DuckDB twin of operators.corpus.corpus_profile (quantile_cont ==
    Spark's exact `percentile`: both interpolate at rank p*(n-1))."""
    v = f"CAST({value_col} AS BIGINT)"
    return f"""SELECT {group_col} AS grp, count(*) AS n_docs,
       min({v}) AS min_v, max({v}) AS max_v,
       CAST(sum({v}) AS BIGINT) AS sum_v,
       quantile_cont({v}, 0.25) AS p25,
       quantile_cont({v}, 0.5) AS p50,
       quantile_cont({v}, 0.75) AS p75,
       quantile_cont({v}, 0.9) AS p90
FROM documents GROUP BY 1"""


def stratified_sample_select(strata_col: str = "lang",
                             n_per_stratum: int = 20) -> str:
    """DuckDB twin of operators.corpus.stratified_sample."""
    from maps_spark.operators.corpus import mix_sql

    h = mix_sql("doc_id")
    return f"""WITH ranked AS (
  SELECT doc_id, {strata_col} AS stratum,
         row_number() OVER (PARTITION BY {strata_col}
                            ORDER BY {h}, doc_id) AS sample_rank
  FROM documents)
SELECT doc_id, stratum, CAST(sample_rank AS INT) AS sample_rank
FROM ranked WHERE sample_rank <= {n_per_stratum}"""


def curate_corpus_select(num_perm: int = 64, bands: int = 16,
                         shingle_k: int = 3, seed: int = 42,
                         max_bucket: int = 1000) -> str:
    """DuckDB twin of operators.corpus.curate_corpus: the same staged
    funnel (quality -> exact dedup -> minhash near-dedup), with the
    minhash CTE chain re-targeted at the exact-dedup survivors and the
    cluster labels from the recursive min-label walk."""
    mh_body = _minhash_ctes(num_perm, bands, shingle_k, seed,
                            max_bucket, table="s2")[len("WITH "):]
    return f"""WITH RECURSIVE q AS ({quality_score_select()}),
d AS (SELECT doc.doc_id, doc.text, q.keep
      FROM documents doc JOIN q ON q.doc_id = doc.doc_id),
s1 AS (SELECT doc_id, text,
              min(doc_id) OVER (PARTITION BY text) AS keeper
       FROM d WHERE keep),
s2 AS (SELECT doc_id, text FROM s1 WHERE doc_id = keeper),
{mh_body},
edges AS (SELECT doc_a AS s, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT s AS doc_id FROM edges),
walk(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.s = w.doc_id
  WHERE w.lbl < e.dst),
comp AS (SELECT doc_id, min(lbl) AS cluster_id FROM walk GROUP BY 1)
SELECT doc.doc_id,
       CASE WHEN doc.doc_id IN (SELECT doc_id FROM d WHERE NOT keep)
              THEN 'quality'
            WHEN doc.doc_id IN (SELECT doc_id FROM s1
                                WHERE doc_id <> keeper)
              THEN 'exact_dup'
            WHEN doc.doc_id IN (SELECT doc_id FROM comp
                                WHERE doc_id <> cluster_id)
              THEN 'near_dup'
            ELSE 'kept' END AS stage
FROM documents doc"""


def lm_score_select(scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.corpus.lm_score — same smoothing, same
    ``floor(scale * ln(...))`` per-bigram integer cut before the sum."""
    return f"""WITH {_TOKS_CTE},
big AS (
  SELECT doc_id, word AS w1,
         lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks QUALIFY w2 IS NOT NULL),
c2 AS (SELECT w1, w2, count(*) AS cnt FROM big GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS head FROM c2 GROUP BY 1),
v AS (SELECT count(DISTINCT word) AS v FROM toks),
lp AS (
  SELECT w1, w2,
         CAST(floor({float(scale)!r} * ln(CAST(cnt + 1 AS DOUBLE)
                    / CAST(head + v AS DOUBLE))) AS BIGINT) AS lp
  FROM c2 JOIN c1 USING (w1) CROSS JOIN v)
SELECT doc_id, count(*) AS n_bigrams,
       CAST(-sum(lp) AS BIGINT) AS nll_scaled,
       CAST(-sum(lp) AS BIGINT) // count(*) AS avg_nll_scaled
FROM big JOIN lp USING (w1, w2) GROUP BY 1"""


def source_stats_select(keep_threshold: float = 0.5,
                        scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.corpus.source_stats over the same
    quality_score CTE."""
    return f"""WITH q AS ({quality_score_select()}),
j AS (SELECT d.source, q.n_tokens, q.keep FROM documents d
      JOIN q ON q.doc_id = d.doc_id),
agg AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
  FROM j GROUP BY 1)
SELECT source, n_docs, n_tokens, n_kept,
       n_kept * {scale} // n_docs AS keep_rate_scaled,
       n_kept * {scale} // n_docs >= {int(keep_threshold * scale)}
         AS reputable
FROM agg"""


def pack_sequences_select(budget: int = 512) -> str:
    """DuckDB twin of operators.packing.pack_sequences: a plain global
    window cumsum over the same deterministic mix order (the engine's
    distributed prefix-sum must equal the single-sort answer)."""
    from maps_spark.operators.corpus import mix_sql

    h = mix_sql("doc_id")
    return f"""WITH d AS (
  SELECT doc_id, {h} AS ord,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY ord, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum
  FROM d)
SELECT doc_id, n_tokens,
       (cum - n_tokens) // {budget} AS seq_id,
       (cum - n_tokens) % {budget} AS seq_offset,
       ((cum - 1) // {budget}) - ((cum - n_tokens) // {budget}) + 1
         AS n_seqs
FROM c"""


def pack_stats_select(budget: int = 512) -> str:
    """DuckDB twin of operators.packing.pack_stats over the same plan."""
    return f"""WITH p AS ({pack_sequences_select(budget)})
SELECT seq_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       CAST(sum(n_tokens) AS BIGINT) * 1000000 // {budget} AS fill_scaled
FROM p GROUP BY 1"""


def chunk_documents_select(chunk: int = 64, stride: int = 48) -> str:
    """DuckDB twin of operators.packing.chunk_documents (same 0-based
    starts, same inclusive-end slice clipping)."""
    return f"""WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {stride})) AS start,
         generate_subscripts(generate_series(0, len(toks) - 1, {stride}),
                             1) - 1 AS chunk_id
  FROM t)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start_token,
       CAST(LEAST({chunk}, len(toks) - start) AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(toks[start + 1:start + {chunk}], ' ') AS chunk_text
FROM s"""


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


def _plane_sql(p) -> str:
    # repr() is shortest-round-trip: DuckDB parses each literal back to
    # the exact double Spark gets via F.lit, so the fold is bit-identical
    return "[" + ", ".join(repr(float(v)) for v in p) + "]"


def _sketch_sql(vec: str, planes) -> str:
    """DuckDB twin of operators.similarity.sketch_col: same plane
    literals, same cast-then-left-fold dot, same sign test."""
    terms = []
    for j, p in enumerate(planes):
        dot = _DOT.format(a=vec, b=_plane_sql(p))
        terms.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    return "(CAST(" + " + ".join(terms) + " AS BIGINT))"


def ann_lsh_select(k: int = 10, n_queries: int = 16, dim: int = 64,
                   n_bits: int = 12, n_tables: int = 4) -> str:
    """DuckDB twin of operators.similarity.lsh_topk (defaults as wired
    in plans.queries.q_ann_lsh_topk)."""
    from maps_spark.operators.similarity import _hyperplanes

    sketches = ",\n         ".join(
        f"{_sketch_sql('embedding', _hyperplanes(dim, n_bits, 1000 + t))}"
        f" AS s{t}" for t in range(n_tables))
    same_bucket = " OR ".join(f"q.s{t} = c.s{t}" for t in range(n_tables))
    dot = _DOT.format(a="q.embedding", b="c.embedding")
    na = _NORM.format(a="q.embedding")
    nb = _NORM.format(a="c.embedding")
    return f"""WITH sk AS (
  SELECT vec_id, embedding,
         {sketches}
  FROM embeddings),
pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM sk q JOIN sk c ON ({same_bucket})
  WHERE q.vec_id < {n_queries} AND c.vec_id <> q.vec_id),
scored AS (
  SELECT p.query_id, p.neighbor_id,
         CAST(floor(({dot}) / (({na}) * ({nb})) * 1000000000.0) AS BIGINT)
           AS cos_scaled
  FROM pairs p
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings c ON c.vec_id = p.neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_scaled,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_scaled DESC, neighbor_id)
           AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_scaled
FROM ranked WHERE rank <= {k}"""


def _ivf_casg_ctes(dim: int = 64, n_clusters: int = 16,
                   kmeans_iters: int = 2, train_sample: int = 2048) -> str:
    """CTE chain reproducing operators.similarity's IVF k-means
    TRAINING plus the full-corpus cluster assignment (ends at ``casg``:
    one (neighbor_id, c) row per corpus vector) — unrolled as one CTE
    block per k-means iteration. Shared by :func:`ann_ivf_select` and
    :func:`semantic_dedup_select`.

    This works because ivf_centroids is defined engine-reproducibly
    (rank-statistics init, integer-quantized centroid sums, left-fold
    dots — see its docstring): the recursion-free fixed-iteration
    k-means is just ``kmeans_iters`` copies of an
    assign/sum/renormalize CTE block, and every float op has exactly
    one evaluation order on both engines. Assumes the corpus has more
    than ``n_clusters`` vectors (true for every testdata SF).
    """
    from maps_spark.operators.similarity import IVF_QUANT

    S = float(IVF_QUANT)
    norm_nv = _NORM.format(a="v")
    it_blocks = []
    for it in range(1, kmeans_iters + 1):
        dot = _DOT.format(a="t.nv", b=f"c{it - 1}.cv")
        norm_mv = _NORM.format(a="m.mv")
        it_blocks.append(f"""asg{it} AS (
  SELECT rn, c FROM (
    SELECT t.rn, c{it - 1}.c,
           row_number() OVER (PARTITION BY t.rn
                              ORDER BY {dot} DESC, c{it - 1}.c) AS rk
    FROM tnorm t CROSS JOIN cent{it - 1} c{it - 1}) z
  WHERE rk = 1),
csz{it} AS (SELECT c, count(*) AS cn FROM asg{it} GROUP BY 1),
sums{it} AS (
  SELECT a.c, q.d, CAST(sum(q.q) AS BIGINT) AS sq
  FROM tq q JOIN asg{it} a USING (rn) GROUP BY 1, 2),
cmean{it} AS (
  SELECT s.c, list(CAST(s.sq AS DOUBLE) / (z.cn * {S!r}) ORDER BY s.d) AS mv
  FROM sums{it} s JOIN csz{it} z USING (c) GROUP BY s.c),
cent{it} AS (
  SELECT p.c,
         CASE WHEN m.c IS NULL THEN p.cv
              ELSE list_transform(m.mv,
                     x -> x / GREATEST({norm_mv}, 1e-12)) END AS cv
  FROM cent{it - 1} p LEFT JOIN cmean{it} m USING (c))""")
    last = f"cent{kmeans_iters}"
    fdot = _DOT.format(a="e.v", b="cf.cv")
    blocks = ",\n".join(it_blocks)
    return f"""trn0 AS (
  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id
  LIMIT {train_sample}),
trn AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS rn,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM trn0),
tnorm AS (
  SELECT rn, list_transform(v, x -> x / GREATEST({norm_nv}, 1e-12)) AS nv
  FROM trn),
tq AS (
  SELECT rn, t.d AS d,
         CAST(floor(nv[t.d] * {S!r} + 0.5) AS BIGINT) AS q
  FROM tnorm CROSS JOIN generate_series(1, {dim}) t(d)),
nc AS (SELECT count(*) AS n FROM trn),
cent0 AS (
  SELECT gs.i AS c, t.nv AS cv
  FROM generate_series(0, {n_clusters - 1}) gs(i)
  CROSS JOIN nc
  JOIN tnorm t ON t.rn = (gs.i * (nc.n - 1)) // {n_clusters - 1}),
{blocks},
emb_d AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings),
fdots AS (
  SELECT e.vec_id, cf.c, {fdot} AS dot
  FROM emb_d e CROSS JOIN {last} cf),
casg AS (
  SELECT vec_id AS neighbor_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, c) AS rk
    FROM fdots) z WHERE rk = 1)"""


def ann_ivf_select(k: int = 10, n_queries: int = 16, dim: int = 64,
                   n_clusters: int = 16, n_probe: int = 4,
                   kmeans_iters: int = 2, train_sample: int = 2048) -> str:
    """DuckDB twin of operators.similarity.ivf_topk — the shared
    training/assignment chain (:func:`_ivf_casg_ctes`) plus query
    probing and per-query top-k."""
    sdot = _DOT.format(a="qe.embedding", b="ce.embedding")
    sna = _NORM.format(a="qe.embedding")
    snb = _NORM.format(a="ce.embedding")
    return f"""WITH {_ivf_casg_ctes(dim, n_clusters, kmeans_iters,
                                    train_sample)},
qasg AS (
  SELECT vec_id AS query_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, c) AS rk
    FROM fdots WHERE vec_id < {n_queries}) z WHERE rk <= {n_probe}),
scored AS (
  SELECT q.query_id, n.neighbor_id,
         CAST(floor(({sdot}) / (({sna}) * ({snb})) * 1000000000.0) AS BIGINT)
           AS cos_scaled
  FROM qasg q JOIN casg n USING (c)
  JOIN embeddings qe ON qe.vec_id = q.query_id
  JOIN embeddings ce ON ce.vec_id = n.neighbor_id
  WHERE n.neighbor_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_scaled,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_scaled DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_scaled
FROM ranked WHERE rank <= {k}"""


def ann_recall_select(k: int = 10, n_queries: int = 16,
                      method: str = "ivf") -> str:
    """DuckDB twin of operators.similarity.ann_recall: the exact and
    approximate top-k selects (already dual-reproducible) nested as
    CTEs, then an integer hit count per query."""
    approx = (ann_ivf_select(k, n_queries) if method == "ivf"
              else ann_lsh_select(k, n_queries))
    return f"""WITH exact AS ({ann_topk_select(k, n_queries)}),
approx AS ({approx})
SELECT e.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
FROM exact e LEFT JOIN approx a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id"""


def ann_recall_pq_select(k: int = 10, n_queries: int = 16,
                         m: int = 8, iters: int = 2,
                         n_cent: int = 16,
                         train_limit: int | None = None) -> str:
    """DuckDB twin of ann_recall(method='pq'): the PQ ADC top-(k+1)
    select nested as a subquery (DuckDB allows WITH inside a
    subquery), self-matches dropped and re-ranked to k, then the
    integer hit count against brute force."""
    pq = pq_topk_select(n_queries=n_queries, k_results=k + 1,
                        m=m, n_cent=n_cent, iters=iters,
                        train_limit=train_limit)
    return f"""WITH exact AS ({ann_topk_select(k, n_queries)}),
approx AS (
  SELECT qid AS query_id, vec_id AS neighbor_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY adist2, vec_id) AS r2
    FROM ({pq}) p
    WHERE vec_id <> qid) z
  WHERE r2 <= {k})
SELECT e.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
FROM exact e LEFT JOIN approx a
  ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id"""


def embedding_near_dupes_select(threshold: float = 0.3, dim: int = 64,
                                n_bits: int = 12, n_tables: int = 4,
                                max_bucket: int = 10_000) -> str:
    """DuckDB twin of operators.similarity.embedding_near_dupes
    (threshold as wired in plans.queries.q_embedding_near_dupes),
    including the per-table hot-bucket cap."""
    from maps_spark.operators.similarity import _hyperplanes

    sketches = ",\n         ".join(
        f"{_sketch_sql('embedding', _hyperplanes(dim, n_bits, 99 + t))}"
        f" AS s{t}" for t in range(n_tables))
    per_table = "\n  UNION\n".join(f"""  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM sk a JOIN sk b ON a.s{t} = b.s{t} AND a.vec_id < b.vec_id
  WHERE a.s{t} NOT IN (SELECT s{t} FROM sk
                       GROUP BY 1 HAVING count(*) > {max_bucket})
    AND b.s{t} NOT IN (SELECT s{t} FROM sk
                       GROUP BY 1 HAVING count(*) > {max_bucket})"""
                                   for t in range(n_tables))
    dot = _DOT.format(a="x.embedding", b="y.embedding")
    na = _NORM.format(a="x.embedding")
    nb = _NORM.format(a="y.embedding")
    return f"""WITH sk AS (
  SELECT vec_id, embedding,
         {sketches}
  FROM embeddings),
pairs AS (
{per_table})
SELECT p.doc_a, p.doc_b,
       CAST(floor(({dot}) / (({na}) * ({nb})) * 1000000000.0) AS BIGINT)
         AS cos_scaled
FROM pairs p
JOIN embeddings x ON x.vec_id = p.doc_a
JOIN embeddings y ON y.vec_id = p.doc_b
WHERE CAST(floor(({dot}) / (({na}) * ({nb})) * 1000000000.0) AS BIGINT)
      >= {int(threshold * 1e9)}"""


# ---------------------------------------------------------------------------
# Signature-family oracles. The engine computes every hash in these
# pipelines as 31-bit Mersenne polynomial folds (operators/dedup.py), so
# the oracle recomputes the IDENTICAL signatures in DuckDB SQL — the
# minhash/simhash candidate generation gets a real hash verdict instead
# of a rows-only check. Corpus assumption: ASCII text (ord(char) ==
# utf-8 byte), single-space tokenization — both hold for the synthetic
# documents table and are asserted in tests.
# ---------------------------------------------------------------------------

_P31 = 2147483647
_B = 1000003

# per-token polynomial hash: bytes base-256 mod 2^31-1 (engine twin:
# operators.dedup._token_hashes)
_TOKEN_HASH = ("CASE WHEN t = '' THEN 0 ELSE list_reduce("
               "list_prepend(CAST(0 AS BIGINT), "
               "list_transform(string_split(t, ''), "
               "c -> CAST(ord(c) AS BIGINT))), "
               f"(h, c) -> (h * 256 + c) % {_P31}) END")

_TOKEN_HASH_LIST = ("list_transform(string_split(text, ' '), "
                    f"t -> {_TOKEN_HASH})")


def _shingle_fold(elems: list[str]) -> str:
    acc = elems[0]
    for e in elems[1:]:
        acc = f"(({acc}) * {_B} + {e}) % {_P31}"
    return acc


def _minhash_ctes(num_perm: int = 64, bands: int = 16,
                  shingle_k: int = 3, seed: int = 42,
                  max_bucket: int = 1000,
                  table: str = "documents") -> str:
    """Shared CTE prefix (token hashes -> shingle sets -> signatures ->
    capped band buckets -> candidate pairs) for the minhash oracles.
    ``table`` is any relation/CTE with (doc_id, text) columns."""
    from maps_spark.operators.dedup import minhash_perm_consts

    rows = num_perm // bands
    a, b = minhash_perm_consts(num_perm, seed)
    k = shingle_k
    windowed = _shingle_fold([f"hs[i + {j}]" for j in range(k)])
    whole = (f"list_reduce(list_prepend(CAST(0 AS BIGINT), hs), "
             f"(x, v) -> (x * {_B} + v) % {_P31})")
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(sset, s -> ({int(a[i])} * s "
        f"+ {int(b[i])}) % {_P31})) AS m{i}"
        for i in range(num_perm))
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {i} AS band, {key} AS bh FROM sigs".format(
            i=i, key=_shingle_fold([f"m{i * rows + j}"
                                    for j in range(rows)]))
        for i in range(bands))
    return f"""WITH th AS (
  SELECT doc_id, {_TOKEN_HASH_LIST} AS hs FROM {table}),
shing AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= {k}
              THEN list_distinct(list_transform(
                     generate_series(1, len(hs) - {k - 1}),
                     i -> {windowed}))
              ELSE [{whole}] END AS sset
  FROM th),
sigs AS (SELECT doc_id, {sig_exprs} FROM shing),
buckets AS ({band_selects}),
capped AS (
  SELECT bu.* FROM buckets bu
  ANTI JOIN (SELECT band, bh FROM buckets
             GROUP BY 1, 2 HAVING count(*) > {max_bucket}) hot
  USING (band, bh)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)"""


def winnow_fingerprints_select(shingle_k: int = 3,
                               window: int = 4,
                               table: str = "documents") -> str:
    """DuckDB twin of operators.text.winnow_fingerprints: same token
    hash, same gram fold, same packed (hash, reversed-pos) key and
    window-min selection."""
    POSCAP = 1 << 20
    k = shingle_k
    windowed = _shingle_fold([f"hs[gs.i + {j}]" for j in range(k)])
    windowed = windowed.replace("hs[gs.i", "hs[i")
    return f"""WITH th AS (
  SELECT doc_id, {_TOKEN_HASH_LIST} AS hs FROM {table}),
g0 AS (
  SELECT doc_id,
         CASE WHEN len(hs) >= {k}
              THEN list_transform(
                     generate_series(1, len(hs) - {k - 1}),
                     i -> {{'p': i - 1, 'g': {windowed}}})
              ELSE [] END AS ghs
  FROM th),
g AS (
  SELECT doc_id, u['p'] AS pos0, u['g'] AS gh
  FROM (SELECT doc_id, unnest(ghs) AS u FROM g0)
  WHERE u['p'] < {POSCAP}),
keys AS (
  SELECT doc_id, pos0,
         gh * {POSCAP} + ({POSCAP - 1} - pos0) AS key,
         count(*) OVER (PARTITION BY doc_id) AS ng
  FROM g),
mins AS (
  SELECT doc_id, pos0, ng,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos0
                        ROWS BETWEEN CURRENT ROW
                        AND {window - 1} FOLLOWING) AS mk
  FROM keys)
SELECT DISTINCT doc_id,
       CAST({POSCAP - 1} - (mk % {POSCAP}) AS INT) AS pos,
       CAST(mk // {POSCAP} AS BIGINT) AS gram_hash
FROM mins WHERE pos0 <= greatest(ng - {window}, 0)"""


def winnow_contamination_select(bench_mod: int = 25,
                                shingle_k: int = 3, window: int = 4,
                                scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.text.winnow_contamination with the
    doc_id % bench_mod corpus/benchmark split."""
    corpus = f"(SELECT * FROM documents WHERE doc_id % {bench_mod} != 0)"
    bench = f"(SELECT * FROM documents WHERE doc_id % {bench_mod} = 0)"
    return f"""WITH dfp AS ({winnow_fingerprints_select(shingle_k,
                                                        window,
                                                        corpus)}),
bfp AS (SELECT DISTINCT gram_hash
        FROM ({winnow_fingerprints_select(shingle_k, window, bench)})),
per_doc AS (
  SELECT d.doc_id, count(*) AS n_fingerprints,
         count(b.gram_hash) AS n_contaminated
  FROM dfp d LEFT JOIN bfp b USING (gram_hash)
  GROUP BY 1)
SELECT c.doc_id,
       CAST(coalesce(p.n_fingerprints, 0) AS BIGINT) AS n_fingerprints,
       CAST(coalesce(p.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       CAST(CASE WHEN coalesce(p.n_fingerprints, 0) > 0
            THEN (p.n_contaminated * {scale}) // p.n_fingerprints
            ELSE 0 END AS BIGINT) AS contamination_scaled
FROM {corpus} c LEFT JOIN per_doc p USING (doc_id)"""


def winnow_pairs_select(shingle_k: int = 3, window: int = 4,
                        min_shared: int = 2, max_df: int = 1000) -> str:
    """DuckDB twin of operators.text.winnow_pairs: the fingerprint
    select nested as a CTE, hot-hash df cap, pair join."""
    return f"""WITH wf AS ({winnow_fingerprints_select(shingle_k,
                                                       window)}),
fps AS (SELECT DISTINCT doc_id, gram_hash FROM wf),
hot AS (SELECT gram_hash FROM fps GROUP BY 1
        HAVING count(*) > {max_df}),
cold AS (SELECT f.* FROM fps f ANTI JOIN hot USING (gram_hash))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
FROM cold a JOIN cold b
  ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {min_shared}"""


def minhash_lsh_select(num_perm: int = 64, bands: int = 16,
                       shingle_k: int = 3, seed: int = 42,
                       max_bucket: int = 1000) -> str:
    """DuckDB twin of operators.dedup.minhash_lsh_pairs."""
    return (_minhash_ctes(num_perm, bands, shingle_k, seed, max_bucket)
            + "\nSELECT doc_a, doc_b, n_bands FROM pairs")


def minhash_verify_select(threshold: float = 0.25, num_perm: int = 64,
                          bands: int = 16, shingle_k: int = 3,
                          seed: int = 42, max_bucket: int = 1000) -> str:
    """DuckDB twin of operators.dedup.minhash_verify over the LSH
    candidate pairs: estimated Jaccard = fraction of agreeing signature
    components (i/num_perm is float-exact, so the hash matches)."""
    agree = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)"
        for i in range(num_perm))
    return (_minhash_ctes(num_perm, bands, shingle_k, seed, max_bucket)
            + f"""
SELECT p.doc_a, p.doc_b,
       CAST({agree} AS DOUBLE) / {num_perm} AS jaccard_est
FROM pairs p
JOIN sigs sa ON sa.doc_id = p.doc_a
JOIN sigs sb ON sb.doc_id = p.doc_b
WHERE CAST({agree} AS DOUBLE) / {num_perm} >= {threshold}""")


def simhash_pairs_select(bands: int = 4, max_bucket: int = 1000,
                         seed: int = 5) -> str:
    """DuckDB twin of operators.dedup.simhash_near_pairs."""
    from maps_spark.operators.dedup import (SIMHASH_BITS,
                                            SIMHASH_THRESHOLD,
                                            simhash_proj_consts)

    c, d = simhash_proj_consts(seed)
    width = SIMHASH_BITS // bands
    bit_exprs = ",\n    ".join(
        "CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN "
        f"({int(c[i])} * h + {int(d[i])}) % {_P31} >= {SIMHASH_THRESHOLD} "
        "THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END AS b{i}".format(i=i)
        .format(i=i)
        for i in range(SIMHASH_BITS))
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {i} AS band, {key} AS bkey FROM bits".format(
            i=i, key=" + ".join(f"b{i * width + t} * {1 << t}"
                                for t in range(width)))
        for i in range(bands))
    return f"""WITH th AS (
  SELECT doc_id, {_TOKEN_HASH_LIST} AS hs FROM documents),
bits AS (SELECT doc_id, {bit_exprs} FROM th),
buckets AS ({band_selects}),
capped AS (
  SELECT bu.* FROM buckets bu
  ANTI JOIN (SELECT band, bkey FROM buckets
             GROUP BY 1, 2 HAVING count(*) > {max_bucket}) hot
  USING (band, bkey))
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM capped a JOIN capped b
  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id"""


def media_features_select(n: int = 64) -> str:
    """DuckDB twin of plans.queries.q_media_features.

    The stub decode (operators.multimodal._decode_image) is
    deterministic: payload = sha256('media-<i>') digest repeated 32x,
    feat[0] = byte0(sha256(hex(payload))) / 255 as float32. hex(payload)
    is just the digest hex repeated 32x, so DuckDB's string-only sha256
    reproduces it as sha256(repeat(sha256('media-<i>'), 32)); the first
    byte comes from the leading hex pair. Every decode succeeds, so
    n_decoded = n."""
    return f"""WITH m AS (
  SELECT i AS media_id,
         CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         ('0x' || substr(sha256(repeat(sha256('media-' || i), 32)),
                         1, 2))::INT AS byte0
  FROM generate_series(0, {n - 1}) t(i))
SELECT kind, count(*) AS n, count(*) AS n_decoded,
       round(sum(CAST(CAST(byte0 / 255.0 AS REAL) AS DOUBLE)), 6)
         AS sum_feat0
FROM m GROUP BY kind"""


def media_frame_sample_select(n: int = 64, every_n: int = 30,
                              n_frames: int = 300) -> str:
    """DuckDB twin of plans.queries.q_media_frame_sample: the frame
    schedule is pure metadata (kind = video for media_id % 3 == 2,
    fixed n_frames), so the sequence-explode plumbing of
    operators.multimodal.frame_sample is independently reproducible —
    only the payload decode (zlib+sha256 synthesis) is not, and that
    is not part of this query's output."""
    return f"""WITH vids AS (
  SELECT i AS media_id FROM generate_series(0, {n - 1}) t(i)
  WHERE i % 3 = 2),
frames AS (
  SELECT media_id,
         unnest(generate_series(0, {n_frames - 1}, {every_n})) AS frame_idx
  FROM vids)
SELECT media_id, count(*) AS n_frames_sampled,
       CAST(max(frame_idx) AS INT) AS last_frame
FROM frames GROUP BY 1"""


def doc_fingerprint_select(modulus: int = (1 << 61) - 1,
                           base: int = 257) -> str:
    """DuckDB twin of operators.text.fingerprint: 61-bit polynomial
    rolling hash. ``h*257`` overflows BIGINT, so the fold uses the
    Mersenne identity 2^61 = 1 (mod p): with h = hi*2^53 + lo,
    h*256 = hi + lo*256 (mod p), hence
    h*257 + c = hi + lo*256 + h + c (mod p) — every intermediate
    < 2^62, BIGINT-exact."""
    assert modulus == (1 << 61) - 1 and base == 257, \
        "split-trick constants are specific to p=2^61-1, base=257"
    m53 = (1 << 53) - 1
    return f"""SELECT doc_id,
  CASE WHEN text = '' THEN 0 ELSE list_reduce(
    list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ''),
                                c -> CAST(ord(c) AS BIGINT))),
    (h, c) -> ((h >> 53) + ((h & {m53}) * 256) + h + c) % {modulus})
  END AS fingerprint
FROM documents"""


def _weights_values(weights: dict[str, float], scale: int) -> str:
    rows = ", ".join(f"('{s}', {int(round(w * scale))})"
                     for s, w in sorted(weights.items()))
    return f"w(source, w_scaled) AS (VALUES {rows})"


def mix_plan_select(weights: dict[str, float], budget_tokens: int,
                    scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.mixture.mix_plan (same integer
    target/rate arithmetic, same whitespace token count)."""
    tgt = f"{budget_tokens} * coalesce(w.w_scaled, 0) // {scale}"
    return f"""WITH {_weights_values(weights, scale)},
per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1)
SELECT p.source, p.n_docs, p.n_tokens,
       CAST(coalesce(w.w_scaled, 0) AS BIGINT) AS w_scaled,
       CAST({tgt} AS BIGINT) AS target_tokens,
       CAST(LEAST({scale}, ({tgt}) * {scale} // p.n_tokens) AS BIGINT)
         AS rate_scaled
FROM per p LEFT JOIN w USING (source)"""


def mix_sample_select(weights: dict[str, float], budget_tokens: int,
                      scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.mixture.mix_sample: per-source keep
    rate from the plan, membership by the shared id mixer."""
    from maps_spark.operators.corpus import mix_sql

    h = mix_sql("d.doc_id")
    return f"""WITH plan AS ({mix_plan_select(weights, budget_tokens,
                                              scale)})
SELECT d.doc_id, d.source,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
FROM documents d JOIN plan p USING (source)
WHERE ({h}) % {scale} < p.rate_scaled"""


def _xent_ctes(prefix: str, model_from: str, scale: int) -> str:
    """CTE block scoring the corpus's bigrams (CTE ``big``) under a
    bigram model trained on ``model_from`` — add-one smoothing with
    the coalesce-to-0 unseen backoff of
    operators.mixture.lm_crossentropy."""
    p = prefix
    return f"""{p}toks AS (
  SELECT doc_id, word, pos FROM (
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS word,
           generate_subscripts(string_split(text, ' '), 1) AS pos
    FROM {model_from}) s
  WHERE word <> ''),
{p}big AS (
  SELECT doc_id, word AS w1,
         lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM {p}toks QUALIFY w2 IS NOT NULL),
{p}c2 AS (SELECT w1, w2, count(*) AS cnt FROM {p}big GROUP BY 1, 2),
{p}c1 AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS head
          FROM {p}c2 GROUP BY 1),
{p}v AS (SELECT count(DISTINCT word) AS v FROM {p}toks),
{p}score AS (
  SELECT b.doc_id, count(*) AS n_bigrams,
         CAST(-sum(CAST(floor({float(scale)!r} * ln(
             CAST(coalesce(c.cnt, 0) + 1 AS DOUBLE)
             / CAST(coalesce(h.head, 0) + v.v AS DOUBLE)))
           AS BIGINT)) AS BIGINT) AS nll_scaled
  FROM big b
  LEFT JOIN {p}c2 c ON c.w1 = b.w1 AND c.w2 = b.w2
  LEFT JOIN {p}c1 h ON h.w1 = b.w1
  CROSS JOIN {p}v v
  GROUP BY 1)"""


def dsir_importance_select(target_where: str,
                           scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.mixture.dsir_importance: avg NLL under
    the self-trained corpus model minus avg NLL under the model trained
    on ``documents WHERE target_where``."""
    return f"""WITH {_TOKS_CTE},
big AS (
  SELECT doc_id, word AS w1,
         lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks QUALIFY w2 IS NOT NULL),
tdocs AS (SELECT doc_id, text FROM documents WHERE {target_where}),
{_xent_ctes('t', 'tdocs', scale)},
{_xent_ctes('s', 'documents', scale)}
SELECT t.doc_id, t.n_bigrams,
       t.nll_scaled // t.n_bigrams AS nll_target_scaled,
       s.nll_scaled // s.n_bigrams AS nll_corpus_scaled,
       CAST(s.nll_scaled // s.n_bigrams
            - t.nll_scaled // t.n_bigrams AS BIGINT)
         AS importance_scaled
FROM tscore t JOIN sscore s USING (doc_id)"""


def dsir_select_select(target_where: str, n: int,
                       scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.mixture.dsir_select (same tie-break)."""
    return f"""WITH imp AS ({dsir_importance_select(target_where, scale)})
SELECT doc_id, importance_scaled,
       CAST(row_number() OVER (ORDER BY importance_scaled DESC, doc_id)
            AS INT) AS sel_rank
FROM imp ORDER BY importance_scaled DESC, doc_id LIMIT {n}"""


def semantic_dedup_select(threshold: float = 0.3, dim: int = 64,
                          n_clusters: int = 16, kmeans_iters: int = 2,
                          train_sample: int = 2048,
                          max_cluster: int = 100_000) -> str:
    """DuckDB twin of operators.similarity.semantic_dedup: the shared
    IVF training/assignment chain, the same cluster-size cap, the same
    within-cluster lowest-id-wins duplicate rule."""
    sdot = _DOT.format(a="ea.embedding", b="eb.embedding")
    sna = _NORM.format(a="ea.embedding")
    snb = _NORM.format(a="eb.embedding")
    thr = int(threshold * 1e9)
    return f"""WITH {_ivf_casg_ctes(dim, n_clusters, kmeans_iters,
                                    train_sample)},
sizes AS (SELECT c, count(*) AS cn FROM casg GROUP BY 1),
pairable AS (
  SELECT n.neighbor_id AS vec_id, n.c
  FROM casg n JOIN sizes s USING (c) WHERE s.cn <= {max_cluster}),
pairs AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb
  FROM pairable a JOIN pairable b ON a.c = b.c AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE CAST(floor(({sdot}) / (({sna}) * ({snb})) * 1000000000.0)
             AS BIGINT) >= {thr}),
dup AS (SELECT idb AS vec_id, min(ida) AS dup_of FROM pairs GROUP BY 1)
SELECT g.neighbor_id AS vec_id, CAST(g.c AS INT) AS cluster, d.dup_of,
       d.dup_of IS NOT NULL AS is_dup
FROM casg g LEFT JOIN dup d ON d.vec_id = g.neighbor_id"""


def shard_assign_select(n_shards: int = 8) -> str:
    """DuckDB twin of operators.packing.shard_assign: the distributed
    rank must equal the single-sort row_number over the same mix
    order."""
    from maps_spark.operators.corpus import mix_sql

    h = mix_sql("doc_id")
    return f"""WITH d AS (SELECT doc_id, {h} AS ord FROM documents),
c AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY ord, doc_id) - 1 AS row_idx
  FROM d)
SELECT doc_id, CAST(row_idx AS BIGINT) AS row_idx,
       CAST(row_idx % {n_shards} AS BIGINT) AS shard
FROM c"""


def event_props_facet_select(field: str = "k") -> str:
    """DuckDB twin of operators.adhoc.event_props_facet (JSON
    extraction via the built-in json extension)."""
    k = f"CAST(json_extract(props, '$.{field}') AS BIGINT)"
    return f"""SELECT event_type, count(*) AS n_events,
       CAST(sum({k}) AS BIGINT) AS sum_k,
       min({k}) AS min_k, max({k}) AS max_k,
       count(DISTINCT {k}) AS n_distinct_k
FROM events GROUP BY 1"""


def dup_ngram_coverage_select(k: int = 8, scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.dedup.dup_ngram_coverage (same shingle
    construction as ngram_jaccard's CTE: docs shorter than k tokens
    contribute one whole-text gram)."""
    return f"""WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
inst AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {k}
              THEN array_to_string(t[i:i+{k - 1}], ' ')
              ELSE array_to_string(t, ' ') END AS gram
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, greatest(len(t) - {k - 1}, 1)))
                 AS i
        FROM toks) s
  WHERE i = 1 OR len(t) >= {k}),
dfc AS (
  SELECT gram, count(*) AS n_docs_gram
  FROM (SELECT DISTINCT doc_id, gram FROM inst) d GROUP BY 1)
SELECT i.doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN f.n_docs_gram >= 2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup_grams,
       CAST(sum(CASE WHEN f.n_docs_gram >= 2 THEN 1 ELSE 0 END)
            * {scale} // count(*) AS BIGINT) AS dup_coverage_scaled
FROM inst i JOIN dfc f USING (gram)
GROUP BY 1"""


def funnel_stages_select(steps: tuple[str, ...] = ("view", "click",
                                                   "purchase")) -> str:
    """DuckDB twin of operators.sessions.funnel_stages: the same
    min-qualifying-timestamp subsequence chain."""
    k = len(steps)
    ctes = [f"""s1 AS (
  SELECT user_id, min(tus) AS t1 FROM ev
  WHERE event_type = '{steps[0]}' GROUP BY 1)"""]
    for i, s in enumerate(steps[1:], start=2):
        ctes.append(f"""s{i} AS (
  SELECT e.user_id, min(e.tus) AS t{i}
  FROM ev e JOIN s{i - 1} p USING (user_id)
  WHERE e.event_type = '{s}' AND e.tus > p.t{i - 1} GROUP BY 1)""")
    joins = "\n".join(f"LEFT JOIN s{i} USING (user_id)"
                      for i in range(1, k + 1))
    stage = " + ".join(
        f"CASE WHEN t{i} IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(1, k + 1))
    tcols = ", ".join(f"t{i}" for i in range(1, k + 1))
    return f"""WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
{",".join(ctes)}
SELECT u.user_id, {tcols}, CAST({stage} AS INT) AS stage_reached
FROM (SELECT DISTINCT user_id FROM ev) u
{joins}"""


def cohort_retention_select(period_us: int = 7 * 86400 * 1_000_000,
                            scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.sessions.cohort_retention."""
    return f"""WITH ev AS (
  SELECT user_id, epoch_us(ts) AS tus FROM events),
act AS (SELECT DISTINCT user_id, tus // {period_us} AS p FROM ev),
first AS (SELECT user_id, min(p) AS cohort FROM act GROUP BY 1),
ret AS (
  SELECT cohort, p - cohort AS k, count(*) AS n_users
  FROM act JOIN first USING (user_id) GROUP BY 1, 2),
sz AS (SELECT cohort, n_users AS cohort_size FROM ret WHERE k = 0)
SELECT r.cohort AS cohort_period, CAST(r.k AS BIGINT) AS k,
       CAST(r.n_users AS BIGINT) AS n_users,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       CAST(r.n_users * {scale} // s.cohort_size AS BIGINT)
         AS retained_scaled
FROM ret r JOIN sz s USING (cohort)"""


def user_distinct_sketch_select() -> str:
    """Exact twin of plans.queries.q_user_distinct_sketch: at the
    gate's cardinality (150 users/group max) the DataSketches HLL
    aggregate is in exact coupon mode, so its estimate equals the
    true distinct count — the approximate regime is pinned by pytest,
    not this gate."""
    return """SELECT event_type, count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS est_users
FROM events GROUP BY 1"""


def ppm_channel_sums_select(n: int = 64, width: int = 32,
                            height: int = 24) -> str:
    """Closed-form twin of operators.multimodal.ppm_channel_sums over
    synthesize_ppm_media's gradient images: the decoder's pixel sums
    must equal the synthesis arithmetic
    (r = x*255//(w-1), g = y*255//(h-1), b = id%256)."""
    return f"""WITH ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
xs AS (SELECT sum(x * 255 // {width - 1}) AS rx
       FROM generate_series(0, {width - 1}) t(x)),
ys AS (SELECT sum(y * 255 // {height - 1}) AS gy
       FROM generate_series(0, {height - 1}) t(y))
SELECT media_id,
       CAST({height} * xs.rx AS BIGINT) AS sum_r,
       CAST({width} * ys.gy AS BIGINT) AS sum_g,
       CAST({width} * {height} * (media_id % 256) AS BIGINT) AS sum_b
FROM ids CROSS JOIN xs CROSS JOIN ys"""


def gif_channel_sums_select(n: int = 64, width: int = 31,
                            height: int = 17) -> str:
    """Closed-form twin of operators.multimodal.gif_channel_sums over
    synthesize_gif_media's palette images: pixel index
    k = (x + 3y + id) mod 256, palette (k, 3k mod 256, 7k mod 256)."""
    return f"""WITH ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
px AS (SELECT x, y FROM generate_series(0, {width - 1}) t(x)
       CROSS JOIN generate_series(0, {height - 1}) u(y))
SELECT media_id,
       CAST(sum((x + 3 * y + media_id) % 256) AS BIGINT) AS sum_r,
       CAST(sum((3 * ((x + 3 * y + media_id) % 256)) % 256)
            AS BIGINT) AS sum_g,
       CAST(sum((7 * ((x + 3 * y + media_id) % 256)) % 256)
            AS BIGINT) AS sum_b
FROM ids CROSS JOIN px GROUP BY 1"""


def gif_coord_sums_select(n: int = 64, width: int = 31,
                          height: int = 17) -> str:
    """Closed-form twin of operators.multimodal.gif_coord_weighted_sums
    over synthesize_gif_media's palette images: pixel index
    k = (x + 3y + id) mod 256, palette (k, 3k mod 256, 7k mod 256),
    each channel weighted by the linear coordinate x + width*y so a
    row-permutation error in the de-interlace changes the output."""
    k = "((x + 3 * y + media_id) % 256)"
    wgt = f"(x + {width} * y)"
    return f"""WITH ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
px AS (SELECT x, y FROM generate_series(0, {width - 1}) t(x)
       CROSS JOIN generate_series(0, {height - 1}) u(y))
SELECT media_id,
       CAST(sum({wgt} * {k}) AS BIGINT) AS wsum_r,
       CAST(sum({wgt} * ((3 * {k}) % 256)) AS BIGINT) AS wsum_g,
       CAST(sum({wgt} * ((7 * {k}) % 256)) AS BIGINT) AS wsum_b
FROM ids CROSS JOIN px GROUP BY 1"""


def gif_frame_sums_select(n: int = 64, width: int = 31,
                          height: int = 17, n_frames: int = 4) -> str:
    """Closed-form twin of operators.multimodal.gif_frame_sums over
    synthesize_gif_anim_media's animations: frame f of id i uses
    pixel index k = (x + 3y + i + 11f) mod 256, palette
    (k, 3k mod 256, 7k mod 256)."""
    return f"""WITH ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
fs AS (SELECT f AS frame_idx
       FROM generate_series(0, {n_frames - 1}) t(f)),
px AS (SELECT x, y FROM generate_series(0, {width - 1}) t(x)
       CROSS JOIN generate_series(0, {height - 1}) u(y))
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(sum((x + 3 * y + media_id + 11 * frame_idx) % 256)
            AS BIGINT) AS sum_r,
       CAST(sum((3 * ((x + 3 * y + media_id + 11 * frame_idx) % 256))
                % 256) AS BIGINT) AS sum_g,
       CAST(sum((7 * ((x + 3 * y + media_id + 11 * frame_idx) % 256))
                % 256) AS BIGINT) AS sum_b
FROM ids CROSS JOIN fs CROSS JOIN px GROUP BY 1, 2"""


def y4m_frame_sums_select(n: int = 64, width: int = 32,
                          height: int = 24, n_frames: int = 6) -> str:
    """Closed-form twin of operators.multimodal.y4m_frame_sums over
    synthesize_y4m_media's streams (Y = x-gradient, U = y-gradient,
    V = (id*7 + frame*13) % 256 per frame)."""
    return f"""WITH ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
fs AS (SELECT f AS frame_idx FROM generate_series(0, {n_frames - 1}) t(f)),
xs AS (SELECT sum(x * 255 // {width - 1}) AS sy
       FROM generate_series(0, {width - 1}) t(x)),
ys AS (SELECT sum(y * 255 // {height - 1}) AS su
       FROM generate_series(0, {height - 1}) t(y))
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST({height} * xs.sy AS BIGINT) AS sum_y,
       CAST({width} * ys.su AS BIGINT) AS sum_u,
       CAST({width} * {height} * ((media_id * 7 + frame_idx * 13) % 256)
            AS BIGINT) AS sum_v
FROM ids CROSS JOIN fs CROSS JOIN xs CROSS JOIN ys"""


def _cms_cells_sql(key_expr: str, width: int, depth: int,
                   seed: int) -> str:
    """UNION ALL of the depth (d, bucket) cell selects — identical
    constants/fold to operators.sessions._cms_bucket_cols."""
    from maps_spark.operators.dedup import P31, minhash_perm_consts
    from maps_spark.operators.sessions import CMS_SEED
    a, b = minhash_perm_consts(depth, CMS_SEED + seed)
    return " UNION ALL ".join(
        f"SELECT CAST({d} AS INT) AS d, "
        f"CAST(((({key_expr}) * {int(a[d])} + {int(b[d])}) % {P31})"
        f" % {width} AS INT) AS bucket FROM src"
        for d in range(depth))


def cms_build_select(width: int = 1024, depth: int = 4,
                     seed: int | None = None) -> str:
    """DuckDB twin of operators.sessions.cms_build over events
    user_id."""
    from maps_spark.operators.dedup import P31
    from maps_spark.operators.sessions import CMS_SEED
    cells = _cms_cells_sql("k", width, depth,
                           CMS_SEED if seed is None else seed)
    return f"""WITH src AS (
  SELECT CAST(user_id AS BIGINT) % {P31} AS k FROM events),
cells AS ({cells})
SELECT d, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2"""


def cms_estimate_select(max_key: int = 128, width: int = 1024,
                        depth: int = 4, seed: int | None = None) -> str:
    """DuckDB twin of operators.sessions.cms_estimate for the distinct
    user_ids under ``max_key``."""
    from maps_spark.operators.dedup import P31
    from maps_spark.operators.sessions import CMS_SEED
    from maps_spark.operators.dedup import minhash_perm_consts
    s = CMS_SEED if seed is None else seed
    build_cells = _cms_cells_sql("k", width, depth, s)
    a, b = minhash_perm_consts(depth, CMS_SEED + s)
    probe_cells = " UNION ALL ".join(
        f"SELECT key, CAST({d} AS INT) AS d, "
        f"CAST((((key % {P31}) * {int(a[d])} + {int(b[d])}) % {P31})"
        f" % {width} AS INT) AS bucket FROM keys"
        for d in range(depth))
    return f"""WITH src AS (
  SELECT CAST(user_id AS BIGINT) % {P31} AS k FROM events),
cells AS ({build_cells}),
sk AS (SELECT d, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
keys AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS key FROM events
         WHERE user_id < {max_key}),
probes AS ({probe_cells}),
est AS (
  SELECT p.key, min(coalesce(sk.cnt, 0)) AS est
  FROM probes p LEFT JOIN sk USING (d, bucket)
  GROUP BY 1)
SELECT key, CAST(est AS BIGINT) AS est FROM est"""


def event_windows_select(window_us: int = 3600 * 1_000_000,
                         scale: int = 1_000) -> str:
    """DuckDB twin of operators.sessions.event_windows."""
    return f"""WITH ev AS (
  SELECT event_type, epoch_us(ts) AS tus,
         CAST(floor(value * {scale}) AS BIGINT) AS vm
  FROM events)
SELECT CAST((tus // {window_us}) * {window_us} AS BIGINT)
         AS window_start,
       event_type, count(*) AS n,
       CAST(sum(vm) AS BIGINT) AS value_milli
FROM ev GROUP BY 1, 2"""


def event_cube_select(scale: int = 1_000) -> str:
    """DuckDB twin of operators.sessions.event_cube (SQL-standard
    CUBE; NULL marks a rolled-up dimension on both engines)."""
    return f"""WITH base AS (
  SELECT event_type,
         CAST(user_id % 10 AS BIGINT) AS cohort,
         CAST(floor(value * {scale}) AS BIGINT) AS vm
  FROM events)
SELECT event_type, cohort, count(*) AS n,
       CAST(sum(vm) AS BIGINT) AS value_milli
FROM base GROUP BY CUBE (event_type, cohort)"""


def value_sketch_select(scale: int | None = None,
                        subs: int | None = None) -> str:
    """DuckDB twin of operators.sessions.value_sketch over events
    (identical dual-dialect bin expression)."""
    from maps_spark.operators.sessions import (QS_SCALE, QS_SUBS,
                                               _qs_bin_sql)
    sc = QS_SCALE if scale is None else scale
    sb = QS_SUBS if subs is None else subs
    m = f"CAST(floor(value * {sc}) AS BIGINT)"
    return f"""SELECT {_qs_bin_sql(m, sb)} AS bin, count(*) AS cnt
FROM events GROUP BY 1"""


def sketch_quantiles_select(qs: list[float],
                            scale: int | None = None,
                            subs: int | None = None) -> str:
    """DuckDB twin of operators.sessions.sketch_quantiles over the
    events value sketch."""
    from maps_spark.operators.sessions import QS_SCALE, QS_SUBS
    sb = QS_SUBS if subs is None else subs
    base = value_sketch_select(scale, subs)
    parts = []
    for q in qs:
        qpm = int(round(q * 1000))
        parts.append(f"""SELECT {qpm} AS q_permille,
  CAST(CASE WHEN bin < 0 THEN 0 ELSE
    (CAST(power(2, bin // {sb}) AS BIGINT)
     * ({sb} + bin % {sb})) // {sb} END AS BIGINT) AS est_scaled
FROM cum
WHERE cum >= CAST(ceil(total * {qpm} / 1000.0) AS BIGINT)
ORDER BY bin LIMIT 1""")
    union = " UNION ALL ".join(f"({p})" for p in parts)
    return f"""WITH sk AS ({base}),
cum AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS cum,
         sum(cnt) OVER () AS total
  FROM sk)
{union}"""


def doc_vector_buckets_select(dim: int = 64) -> str:
    """DuckDB twin of operators.similarity.doc_vector_buckets (same
    polynomial token hash, same bucket fold)."""
    return f"""WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
h AS (
  SELECT doc_id, CAST(({_TOKEN_HASH}) % {dim} AS INT) AS bucket
  FROM toks WHERE t <> '')
SELECT doc_id, bucket, count(*) AS cnt FROM h GROUP BY 1, 2"""


def attribute_conversions_select(conversion: str = "purchase",
                                 touches: tuple[str, ...] = ("click",
                                                             "view"),
                                 window_us: int = 7 * 86400 * 1_000_000
                                 ) -> str:
    """DuckDB twin of operators.sessions.attribute_conversions."""
    tl = ", ".join(f"'{t}'" for t in touches)
    return f"""WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus FROM events),
conv AS (
  SELECT user_id, event_id AS conversion_id, tus AS conv_tus
  FROM ev WHERE event_type = '{conversion}'),
touch AS (
  SELECT user_id, event_id AS touch_id, event_type AS touch_type,
         tus AS touch_tus
  FROM ev WHERE event_type IN ({tl})),
cand AS (
  SELECT c.conversion_id, t.touch_id, t.touch_type, t.touch_tus,
         row_number() OVER (PARTITION BY c.conversion_id
                            ORDER BY t.touch_tus DESC,
                                     t.touch_id DESC) AS rk
  FROM conv c JOIN touch t USING (user_id)
  WHERE t.touch_tus <= c.conv_tus
    AND c.conv_tus - t.touch_tus <= {window_us})
SELECT c.conversion_id, c.user_id, c.conv_tus, a.touch_id,
       a.touch_type, a.touch_tus, c.conv_tus - a.touch_tus AS lag_us
FROM conv c LEFT JOIN (SELECT * FROM cand WHERE rk = 1) a
  USING (conversion_id)"""


def conversion_latency_sketch_select(
        conversion: str = "purchase",
        touches: tuple[str, ...] = ("click", "view"),
        window_us: int = 7 * 86400 * 1_000_000) -> str:
    """DuckDB twin of operators.sessions.conversion_latency_sketch:
    the attribution select nested as a CTE, lags binned with the
    shared integer bin expression."""
    from maps_spark.operators.sessions import QS_SUBS, _qs_bin_sql
    att = attribute_conversions_select(conversion, touches, window_us)
    return f"""WITH att AS ({att}),
lags AS (SELECT CAST(lag_us AS BIGINT) AS m FROM att
         WHERE lag_us IS NOT NULL)
SELECT {_qs_bin_sql("m", QS_SUBS)} AS bin, count(*) AS cnt
FROM lags GROUP BY 1"""


def rolling_active_users_select(window_days: int = 7,
                                day_us: int = 86_400_000_000) -> str:
    """Exact twin of operators.sessions.rolling_active_users — valid
    while per-window cardinality keeps the HLL in exact coupon mode
    (true at gate scale; the approximate regime is pytest-pinned)."""
    return f"""WITH ev AS (
  SELECT epoch_us(ts) // {day_us} AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM ev)
SELECT d.day AS day, {window_days} AS window_days,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS est_active
FROM days d JOIN ev e
  ON e.day <= d.day AND e.day > d.day - {window_days}
GROUP BY 1"""


def funnel_counts_select(steps: tuple[str, ...] = ("view", "click",
                                                   "purchase"),
                         scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.sessions.funnel_counts over the same
    stage frame."""
    k = len(steps)
    names = ", ".join(f"({i}, '{s}')"
                      for i, s in enumerate(["(any)"] + list(steps)))
    return f"""WITH st AS ({funnel_stages_select(steps)}),
per AS (SELECT stage_reached, count(*) AS n FROM st GROUP BY 1),
grid AS (SELECT i AS stage FROM generate_series(0, {k}) t(i)),
reach AS (
  SELECT g.stage, CAST(coalesce(sum(p.n), 0) AS BIGINT) AS n_users
  FROM grid g LEFT JOIN per p ON p.stage_reached >= g.stage
  GROUP BY 1),
names(stage, step) AS (VALUES {names})
SELECT CAST(r.stage AS INT) AS stage, r.n_users,
       CASE WHEN lag(r.n_users) OVER (ORDER BY r.stage) > 0
            THEN r.n_users * {scale}
                 // lag(r.n_users) OVER (ORDER BY r.stage) END
         AS conv_from_prev_scaled,
       n.step
FROM reach r JOIN names n ON n.stage = r.stage"""


def quality_tiers_select(n_tiers: int = 4, scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.mixture.quality_tiers over the
    lm_score quality signal (ascending: low NLL = tier 0)."""
    return f"""WITH lm AS ({lm_score_select(scale)}),
n AS (SELECT count(*) AS total FROM lm),
r AS (
  SELECT doc_id, avg_nll_scaled AS score,
         row_number() OVER (ORDER BY avg_nll_scaled, doc_id) - 1
           AS rank
  FROM lm)
SELECT r.doc_id, r.score, CAST(r.rank AS BIGINT) AS rank,
       CAST(r.rank * {n_tiers} // n.total AS INT) AS tier
FROM r CROSS JOIN n"""


def asof_join_select(left_type: str = "purchase",
                     right_type: str = "click",
                     tolerance_us: int | None = None) -> str:
    """DuckDB twin of the as-of join gate (union-and-window form, same
    tie rule: right side sorts before left at equal timestamps)."""
    tol = (f"AND l.tus - m_ts <= {tolerance_us}"
           if tolerance_us is not None else "")
    return f"""WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
         CAST(floor(value * 1000) AS BIGINT) AS vm
  FROM events),
u AS (
  SELECT user_id, tus, 1 AS side, event_id,
         CAST(NULL AS BIGINT) AS rts, CAST(NULL AS BIGINT) AS rvm
  FROM ev WHERE event_type = '{left_type}'
  UNION ALL
  SELECT user_id, tus, 0 AS side, CAST(NULL AS BIGINT), tus, vm
  FROM ev WHERE event_type = '{right_type}'),
c AS (
  SELECT user_id, tus, side, event_id,
         last_value(rts IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY tus, side
                 ROWS UNBOUNDED PRECEDING) AS m_ts,
         last_value(rvm IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY tus, side
                 ROWS UNBOUNDED PRECEDING) AS m_vm
  FROM u)
SELECT l.event_id AS purchase_id, l.user_id, l.tus,
       CASE WHEN m_ts IS NOT NULL {tol} THEN m_ts END AS tus_asof,
       CASE WHEN m_ts IS NOT NULL {tol} THEN m_vm END AS vm_asof
FROM c l WHERE side = 1"""


def session_events_range_select(gap_us: int = 12 * 3600 * 1_000_000
                                ) -> str:
    """DuckDB twin of the range-join gate: events joined to their
    user's session intervals with a plain BETWEEN (exact semantics the
    bucketed Spark operator must reproduce), rolled up per session."""
    from maps_spark.operators.sessions import sessionize_sql
    return f"""WITH sess AS ({sessionize_sql(gap_us)}),
ev AS (SELECT user_id, epoch_us(ts) AS tus FROM events)
SELECT s.user_id, s.session_start, s.session_end,
       count(*) AS n_inside
FROM sess s JOIN ev e
  ON e.user_id = s.user_id
 AND e.tus BETWEEN s.session_start AND s.session_end
GROUP BY 1, 2, 3"""


def event_type_crosstab_select(types: tuple[str, ...] = (
        "click", "view", "purchase", "signup", "error")) -> str:
    """DuckDB twin of operators.adhoc.event_type_crosstab."""
    cols = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{t}" for t in types)
    return f"""SELECT user_id,
       {cols},
       count(*) AS n_total
FROM events GROUP BY 1"""


def event_rollup_select() -> str:
    """DuckDB twin of operators.adhoc.event_rollup (same epoch-year
    bucketing, same subtotal flags)."""
    yr = f"epoch_us(ts) // {365 * 86400 * 1_000_000} + 1970"
    return f"""WITH base AS (
  SELECT event_type, CAST({yr} AS BIGINT) AS year FROM events)
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(year, -1) AS year,
       event_type IS NULL AS is_total_type,
       year IS NULL AS is_total_year,
       count(*) AS n
FROM base GROUP BY ROLLUP (event_type, year)"""


def top_events_per_user_select(k: int = 3) -> str:
    """DuckDB twin of operators.adhoc.top_events_per_user."""
    return f"""WITH v AS (
  SELECT user_id, event_id,
         CAST(floor(value * 1000) AS BIGINT) AS value_milli
  FROM events),
r AS (
  SELECT user_id, event_id, value_milli,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value_milli DESC, event_id)
           AS rnk
  FROM v)
SELECT user_id, event_id, value_milli, CAST(rnk AS INT) AS rnk
FROM r WHERE rnk <= {k}"""


def wav_stats_select(n: int = 64, sample_rate: int = 8000,
                     n_samples: int = 1024) -> str:
    """Closed-form twin of operators.multimodal.wav_stats over
    synthesize_wav_media's sawtooth PCM: the decoder's amplitude sums
    must equal the synthesis arithmetic
    (sample[t] = (t*(id+3)) % 2048 - 1024)."""
    return f"""WITH ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
s AS (SELECT media_id,
         sum((t * (media_id + 3)) % 2048 - 1024) AS sum_amp,
         sum(abs((t * (media_id + 3)) % 2048 - 1024)) AS sum_abs
      FROM ids CROSS JOIN generate_series(0, {n_samples - 1}) g(t)
      GROUP BY media_id)
SELECT media_id, CAST({n_samples} AS BIGINT) AS n_samples,
       CAST({sample_rate} AS BIGINT) AS sample_rate,
       CAST(sum_amp AS BIGINT) AS sum_amp,
       CAST(sum_abs AS BIGINT) AS sum_abs
FROM s"""


def mjpeg_frame_sums_select(n: int = 64, blocks_x: int = 4,
                            blocks_y: int = 3,
                            n_frames: int = 4) -> str:
    """Closed-form twin of operators.multimodal.mjpeg_frame_sums
    over synthesize_mjpeg_media's MJPEG/AVI payloads: every frame is
    a flat-block baseline JPEG at q=16 with level
    (17*bx + 29*by + id + 7*frame) % 256, so each frame's sum is the
    same DC-only integer arithmetic as the still-JPEG gates — per
    (media_id, frame_idx)."""
    return f"""WITH fr AS (SELECT i AS media_id, f AS frame_idx
  FROM generate_series(0, {n - 1}) t(i)
  CROSS JOIN generate_series(0, {n_frames - 1}) g(f)),
blocks AS (
  SELECT media_id, frame_idx,
         (17 * bx + 29 * by + media_id + 7 * frame_idx) % 256 AS L
  FROM fr
  CROSS JOIN generate_series(0, {blocks_x - 1}) gx(bx)
  CROSS JOIN generate_series(0, {blocks_y - 1}) gy(by)),
dec AS (
  SELECT media_id, frame_idx,
         least(255, greatest(0,
           (L - 127 - (((L - 127) % 2) + 2) % 2) + 128)) AS d
  FROM blocks)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST({blocks_x * blocks_y * 64} AS BIGINT) AS n_pixels,
       CAST(64 * sum(d) AS BIGINT) AS sum_lum
FROM dec GROUP BY 1, 2"""


def adpcm_stats_select(n: int = 64, blocks: int = 2,
                       block_align: int = 36) -> str:
    """State-machine twin of operators.multimodal.adpcm_stats over
    synthesize_adpcm_media's deterministic nibble streams: a
    recursive CTE re-runs the ENTIRE IMA ADPCM decoder — 89-entry
    step table, per-nibble diff accumulation, predictor clamp to
    int16, index walk clamp to [0, 88] — sample by sample, like the
    BPE unrolled-CTE oracle. Only the step TABLE (spec data) is
    shared with the Python decoder; the transition logic is
    re-expressed in SQL."""
    from maps_spark.operators.multimodal import _IMA_STEPS
    spb = 1 + (block_align - 4) * 2
    steps = ", ".join(f"({i}, {s})" for i, s in enumerate(_IMA_STEPS))
    return f"""WITH RECURSIVE
steps(i, s) AS (VALUES {steps}),
blk AS (SELECT i AS media_id, b
  FROM generate_series(0, {n - 1}) t(i)
  CROSS JOIN generate_series(0, {blocks - 1}) g(b)),
dec AS (
  SELECT media_id, b, 0 AS k,
         ((37 * media_id + 13 * b) % 256 - 128) * 16 AS pred,
         (3 * media_id + 5 * b) % 89 AS idx
  FROM blk
  UNION ALL
  SELECT media_id, b, k + 1,
         GREATEST(-32768, LEAST(32767,
           pred + CASE WHEN nib >= 8 THEN -diff ELSE diff END)),
         GREATEST(0, LEAST(88, idx
           + CASE nib & 7 WHEN 4 THEN 2 WHEN 5 THEN 4
                  WHEN 6 THEN 6 WHEN 7 THEN 8 ELSE -1 END))
  FROM (
    SELECT q.*,
           (q.s >> 3)
           + CASE WHEN q.nib & 1 = 1 THEN q.s >> 2 ELSE 0 END
           + CASE WHEN q.nib & 2 = 2 THEN q.s >> 1 ELSE 0 END
           + CASE WHEN q.nib & 4 = 4 THEN q.s ELSE 0 END AS diff
    FROM (
      SELECT d.media_id, d.b, d.k, d.pred, d.idx, st.s,
             (7 * d.k + 11 * d.media_id + 3 * d.b) % 16 AS nib
      FROM dec d JOIN steps st ON st.i = d.idx
      WHERE d.k < {spb - 1}) q))
SELECT media_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(pred) AS BIGINT) AS sum_amp,
       CAST(sum(abs(pred)) AS BIGINT) AS sum_abs,
       CAST(max(pred) AS BIGINT) AS max_amp
FROM dec GROUP BY 1"""


def nb_classify_select(scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.classify.nb_classify self-trained on
    documents with label = source: same add-one smoothing, same
    floor-at-scale per-token integer cut, same seen/unseen score
    decomposition, ties on label ascending."""
    return f"""WITH {_TOKS_CTE},
lab AS (SELECT doc_id, source AS label FROM documents),
tm AS (SELECT t.doc_id, l.label, t.word FROM toks t
       JOIN lab l USING (doc_id)),
cwc AS (SELECT label, word, count(*) AS cnt FROM tm GROUP BY 1, 2),
cw AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS total
       FROM cwc GROUP BY 1),
v AS (SELECT greatest(count(DISTINCT word), 1) AS v FROM tm),
nd AS (SELECT label, count(*) AS nd FROM lab GROUP BY 1),
n AS (SELECT count(*) AS n FROM lab),
cls AS (
  SELECT label,
         CAST(floor({float(scale)!r} * ln(CAST(nd AS DOUBLE)
              / CAST(n AS DOUBLE))) AS BIGINT) AS prior_lp,
         CAST(floor({float(scale)!r} * ln(1.0
              / CAST(total + v AS DOUBLE))) AS BIGINT) AS lp0
  FROM nd CROSS JOIN n JOIN cw USING (label) CROSS JOIN v),
delta AS (
  SELECT label, word,
         CAST(floor({float(scale)!r} * ln(CAST(cnt + 1 AS DOUBLE)
                / CAST(total + v AS DOUBLE)))
            - floor({float(scale)!r} * ln(1.0
                / CAST(total + v AS DOUBLE))) AS BIGINT) AS dlp
  FROM cwc JOIN cw USING (label) CROSS JOIN v),
tf AS (SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
nt AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens
       FROM tf GROUP BY 1),
seen AS (
  SELECT tf.doc_id, d.label,
         CAST(sum(tf.tf * d.dlp) AS BIGINT) AS seen_lp
  FROM tf JOIN delta d USING (word) GROUP BY 1, 2),
scores AS (
  SELECT nt.doc_id, c.label,
         c.prior_lp + nt.n_tokens * c.lp0
           + COALESCE(s.seen_lp, 0) AS score
  FROM nt CROSS JOIN cls c
  LEFT JOIN seen s ON s.doc_id = nt.doc_id AND s.label = c.label),
ranked AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, label) AS rk,
         lead(score) OVER (PARTITION BY doc_id
                           ORDER BY score DESC, label) AS nxt
  FROM scores)
SELECT doc_id, label AS pred_label,
       CAST(score AS BIGINT) AS score_scaled,
       CAST(score - COALESCE(nxt, score) AS BIGINT) AS margin_scaled
FROM ranked WHERE rk = 1"""


_EMB_SCALED_CTE = """comp AS (
  SELECT vec_id, label,
         CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
         unnest(embedding) AS x
  FROM embeddings),
scaled AS (
  SELECT vec_id, label, pos,
         CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS xs
  FROM comp)"""


def embedding_profile_select() -> str:
    """DuckDB twin of operators.similarity.embedding_profile: same
    float->double widening, same floor-at-scale integer components."""
    return f"""WITH {_EMB_SCALED_CTE}
SELECT label, pos, count(*) AS n_vecs,
       CAST(sum(xs) AS BIGINT) AS sum_scaled
FROM scaled GROUP BY 1, 2"""


def embedding_outliers_select() -> str:
    """DuckDB twin of operators.similarity.embedding_outliers — the
    n^2-scaled exact integer distance to the group centroid."""
    return f"""WITH {_EMB_SCALED_CTE},
cent AS (SELECT label, pos, count(*) AS n, sum(xs) AS s
         FROM scaled GROUP BY 1, 2)
SELECT sc.vec_id, sc.label,
       CAST(sum((c.n * sc.xs - c.s) * (c.n * sc.xs - c.s)) AS BIGINT)
         AS dist2_n2
FROM scaled sc JOIN cent c USING (label, pos) GROUP BY 1, 2"""


def domain_cap_select(cap: int = 20) -> str:
    """DuckDB twin of operators.corpus.domain_cap on documents/source
    (lowest doc_id kept)."""
    return f"""SELECT doc_id, source FROM documents
QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id)
        <= {cap}"""


def normalize_text_select() -> str:
    """DuckDB twin of operators.text.normalize_text — the regex family
    parses identically in RE2 and Java regex (the 'g' flag matches
    Spark's replace-all default)."""
    return r"""WITH n AS (
  SELECT doc_id, text,
         trim(regexp_replace(regexp_replace(lower(text),
              '[\x00-\x1F\x7F]', ' ', 'g'), '\s+', ' ', 'g'))
           AS norm_text
  FROM documents)
SELECT doc_id, norm_text,
       CAST(length(text) AS BIGINT) AS n_chars_raw,
       CAST(length(norm_text) AS BIGINT) AS n_chars_norm
FROM n"""


def _dup_span_islands_cte(min_gram: int = 8) -> str:
    L = min_gram
    return f"""arr AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents),
g0 AS (
  SELECT doc_id, w, unnest(range(0, len(w) - {L} + 1)) AS i
  FROM arr WHERE len(w) >= {L}),
g AS (
  SELECT doc_id, CAST(i AS INT) AS i,
         md5(array_to_string(list_slice(w, i + 1, i + {L}), ' ')) AS gh
  FROM g0),
c AS (SELECT gh FROM g GROUP BY gh HAVING count(*) > 1),
d AS (SELECT g.doc_id, g.i, g.i + {L - 1} AS e FROM g JOIN c USING (gh)),
isl AS (
  SELECT doc_id, i, e,
         sum(CASE WHEN pm IS NULL OR i > pm + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i) AS island
  FROM (SELECT doc_id, i, e,
               max(e) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS pm
        FROM d) s),
spans AS (
  SELECT doc_id, CAST(min(i) AS INT) AS span_start,
         CAST(max(e) AS INT) AS span_end
  FROM isl GROUP BY doc_id, island)"""


def dup_spans_select(min_gram: int = 8) -> str:
    """DuckDB twin of operators.dedup.dup_spans — same md5 grams, same
    gap-and-islands merge."""
    return f"""WITH {_dup_span_islands_cte(min_gram)}
SELECT doc_id, span_start, span_end,
       CAST(span_end - span_start + 1 AS INT) AS span_tokens
FROM spans"""


def dup_span_stats_select(min_gram: int = 8,
                          scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.dedup.dup_span_stats."""
    return f"""WITH {_dup_span_islands_cte(min_gram)},
per_doc AS (
  SELECT doc_id,
         CAST(sum(span_end - span_start + 1) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id),
nt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM arr)
SELECT nt.doc_id, nt.n_tokens,
       COALESCE(p.dup_tokens, 0) AS dup_tokens,
       CAST(CASE WHEN nt.n_tokens > 0
            THEN (COALESCE(p.dup_tokens, 0) * {scale}) // nt.n_tokens
            ELSE 0 END AS BIGINT) AS dup_frac_scaled
FROM nt LEFT JOIN per_doc p ON p.doc_id = nt.doc_id"""


def scrub_dup_spans_select(min_gram: int = 8) -> str:
    """DuckDB twin of operators.dedup.scrub_dup_spans."""
    return f"""WITH {_dup_span_islands_cte(min_gram)},
seq AS (
  SELECT doc_id, unnest(w) AS word,
         CAST(generate_subscripts(w, 1) - 1 AS INT) AS pos
  FROM arr),
cov AS (
  SELECT doc_id, CAST(unnest(range(span_start, span_end + 1)) AS INT)
           AS pos
  FROM spans),
removed AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY 1),
kept AS (SELECT s.doc_id, s.word, s.pos
         FROM seq s ANTI JOIN cov c USING (doc_id, pos))
SELECT k.doc_id,
       string_agg(k.word, ' ' ORDER BY k.pos) AS clean_text,
       CAST(COALESCE(any_value(r.n_removed), 0) AS BIGINT)
         AS n_removed_tokens
FROM kept k LEFT JOIN removed r ON r.doc_id = k.doc_id
GROUP BY k.doc_id"""


def wav_frame_features_select(n: int = 64, n_samples: int = 1024,
                              frame: int = 256) -> str:
    """Closed-form twin of operators.multimodal.wav_frame_features
    over synthesize_wav_media's sawtooth (sample[t] =
    (t*(id+3)) % 2048 - 1024): per-frame exact energy and sign-flip
    counts recomputed from the synthesis arithmetic."""
    return f"""WITH ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
s AS (SELECT media_id, t,
         (t * (media_id + 3)) % 2048 - 1024 AS v
      FROM ids CROSS JOIN generate_series(0, {n_samples - 1}) g(t)),
s2 AS (SELECT media_id, t, v,
          CAST(t // {frame} AS INT) AS frame_idx,
          lag(v) OVER (PARTITION BY media_id, t // {frame}
                       ORDER BY t) AS pv
       FROM s)
SELECT media_id, frame_idx,
       CAST(count(*) AS INT) AS frame_len,
       CAST(sum(v * v) AS BIGINT) AS energy,
       CAST(sum(CASE WHEN pv IS NOT NULL
                 AND ((v >= 0) <> (pv >= 0)) THEN 1 ELSE 0 END)
            AS BIGINT) AS zero_crossings
FROM s2 GROUP BY 1, 2"""


def grouped_split_select(val_frac: float = 0.1) -> str:
    """DuckDB twin of operators.corpus.grouped_split on
    documents/source (ASCII group names — the token-hash fold's
    documented scope)."""
    from maps_spark.operators.corpus import mix_sql
    cut = int(val_frac * _P31)
    return f"""WITH s AS (SELECT doc_id, source, source AS t
               FROM documents)
SELECT doc_id, source,
       CASE WHEN {mix_sql(f"({_TOKEN_HASH})")} < {cut}
            THEN 'val' ELSE 'train' END AS split
FROM s"""


def jpeg_pixel_sums_select(n: int = 64, blocks_x: int = 4,
                           blocks_y: int = 3) -> str:
    """Closed-form twin of operators.multimodal.jpeg_pixel_sums over
    synthesize_jpeg_media's flat-block grayscale JPEGs at q=16: a flat
    block round-trips through DC-only quantization, so the decoded
    level is clamp(2*((L-127) floordiv 2) + 128) with
    L = (17*bx + 29*by + id) % 256 — pure integer arithmetic."""
    return f"""WITH ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
blocks AS (
  SELECT media_id,
         (17 * bx + 29 * by + media_id) % 256 AS L
  FROM ids
  CROSS JOIN generate_series(0, {blocks_x - 1}) gx(bx)
  CROSS JOIN generate_series(0, {blocks_y - 1}) gy(by)),
dec AS (
  -- floor((L-127)/2) with DuckDB's truncating //: subtract the
  -- positive remainder first so the numerator is even
  SELECT media_id,
         least(255, greatest(0,
           (L - 127 - (((L - 127) % 2) + 2) % 2) + 128)) AS d
  FROM blocks)
SELECT media_id,
       CAST({blocks_x * blocks_y * 64} AS BIGINT) AS n_pixels,
       CAST(64 * sum(d) AS BIGINT) AS sum_lum
FROM dec GROUP BY 1"""


def hot_keys_select(k: int = 20, scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.adhoc.hot_keys over events.user_id."""
    return f"""WITH c AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
top AS (SELECT * FROM c ORDER BY cnt DESC, user_id LIMIT {k})
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS INT)
         AS rank,
       CAST(user_id AS VARCHAR) AS key, cnt,
       CAST(cnt * {scale} // total AS BIGINT) AS share_scaled
FROM top CROSS JOIN t"""


def radius_pairs_select(radius_deg: float,
                        scale: int = 1_000_000_000_000) -> str:
    """BRUTE-FORCE DuckDB twin of operators.binning.radius_pairs over
    the occurrence view (all unordered pairs, exact distance filter)
    — agreement proves the Spark side's grid banding is lossless."""
    from maps_spark.sources.occurrence import occurrence_cte
    r2 = radius_deg * radius_deg
    return f"""{occurrence_cte()},
p AS (
  SELECT occurrenceId AS id,
         CAST(decimalLatitude AS DOUBLE) AS lat,
         CAST(decimalLongitude AS DOUBLE) AS lng
  FROM occ
  WHERE decimalLatitude IS NOT NULL AND decimalLongitude IS NOT NULL)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(floor(((a.lat - b.lat) * (a.lat - b.lat)
             + (a.lng - b.lng) * (a.lng - b.lng)) * {float(scale)!r})
            AS BIGINT) AS dist2_scaled
FROM p a JOIN p b ON a.id < b.id
WHERE ((a.lat - b.lat) * (a.lat - b.lat)
       + (a.lng - b.lng) * (a.lng - b.lng)) <= {float(r2)!r}"""


def negative_samples_select(k: int = 4, oversample: int = 4,
                            num_buckets: int = 64) -> str:
    """DuckDB twin of operators.mixture.negative_samples over the
    gate's same-source positive pairs (anchor = every doc, positive
    = its source's min doc_id): the bucket-probe draw replayed
    bitwise with the shared two-round mixer — probe bucket, min
    probe-keyed mix per bucket, self/positive drop, earliest-probe
    dedup, first-k rank."""
    from maps_spark.operators.corpus import mix_sql
    from maps_spark.operators.dedup import P31
    n_probes = k + oversample
    return f"""WITH
pos AS (SELECT doc_id AS doc_a,
               min(doc_id) OVER (PARTITION BY source) AS doc_b
        FROM documents),
cands AS (SELECT DISTINCT doc_id AS negative,
                 {mix_sql(f"(doc_id % {P31})")} % {num_buckets}
                   AS bucket
          FROM documents),
anchors AS (SELECT DISTINCT doc_a AS anchor FROM pos),
probes AS (
  SELECT anchor, j,
         {mix_sql(f"(((anchor % {P31}) * 64 + j) % {P31})")}
           % {num_buckets} AS bucket
  FROM anchors CROSS JOIN generate_series(0, {n_probes - 1}) g(j)),
drawn AS (
  SELECT anchor, j, negative FROM (
    SELECT p.anchor, p.j, c.negative,
           row_number() OVER (PARTITION BY p.anchor, p.j
             ORDER BY {mix_sql(f"(((c.negative % {P31}) * 53 + "
                               f"(p.anchor % {P31}) * 7 + p.j) "
                               f"% {P31})")}, c.negative) AS rn
    FROM probes p JOIN cands c USING (bucket)) q
  WHERE rn = 1),
neg AS (
  SELECT d.anchor, d.j, d.negative
  FROM drawn d
  WHERE d.negative <> d.anchor
    AND NOT EXISTS (SELECT 1 FROM pos
                    WHERE pos.doc_a = d.anchor
                      AND pos.doc_b = d.negative)),
dedup AS (
  SELECT anchor, j, negative FROM (
    SELECT anchor, j, negative,
           row_number() OVER (PARTITION BY anchor, negative
                              ORDER BY j) AS rn
    FROM neg) q WHERE rn = 1)
SELECT anchor, negative, CAST(rank AS INT) AS rank FROM (
  SELECT anchor, negative,
         row_number() OVER (PARTITION BY anchor ORDER BY j) AS rank
  FROM dedup) q WHERE rank <= {k}"""


def lz_complexity_select(scale: int = 1_000_000) -> str:
    """State-machine twin of operators.text.lz_complexity: a
    recursive CTE replays the LZ78 incremental parse phrase by
    phrase. The parse dictionary is prefix-closed (every phrase is a
    previous phrase plus one character), so the next phrase length
    is 1 + the longest dictionary entry that prefixes the remainder,
    capped at the remainder (a trailing already-known phrase still
    counts, matching the Python parse)."""
    return f"""WITH RECURSIVE
parse AS (
  SELECT doc_id, text AS rem, CAST([] AS VARCHAR[]) AS dict, 0 AS k
  FROM documents WHERE text <> '' AND text IS NOT NULL
  UNION ALL
  SELECT doc_id, rem[plen + 1:], list_append(dict, rem[1:plen]),
         k + 1
  FROM (
    SELECT doc_id, rem, dict, k,
           least(len(rem),
             1 + coalesce(list_max(list_transform(dict,
                   d -> CASE WHEN d = rem[1:len(d)]
                        THEN len(d) END)), 0)) AS plen
    FROM parse WHERE rem <> '') q),
fin AS (SELECT doc_id, max(k) AS n_phrases FROM parse GROUP BY 1)
SELECT d.doc_id,
       CAST(len(coalesce(d.text, '')) AS BIGINT) AS n_chars,
       CAST(coalesce(f.n_phrases, 0) AS BIGINT) AS n_phrases,
       CAST(CASE WHEN len(coalesce(d.text, '')) > 0
            THEN coalesce(f.n_phrases, 0) * {scale}
                 // len(d.text) ELSE 0 END AS BIGINT)
         AS density_scaled
FROM documents d LEFT JOIN fin f USING (doc_id)"""


def radius_haversine_select(radius_km: float = 25.0,
                            id_mod: int = 7) -> str:
    """BRUTE-FORCE DuckDB twin of
    operators.binning.radius_pairs_haversine over the gate's point
    subset — agreement proves the spherical banding (grid + polar
    caps) is lossless AND the great-circle arithmetic matches.

    Why a float-trig hash is safe HERE: cross-engine libm sin/cos
    differ only in the last ulp (~1e-13 relative, nanometres at this
    radius), so a hash could flip only if some pair sat that close
    to the radius cut or to a dist_m flooring boundary. Measured on
    the sf0.01 compare set: the nearest pair to the 25 km cut is
    64 m away and the nearest flooring boundary 12 mm away — ten
    orders of magnitude of margin. The operator's general contract
    stays "not oracle-hashable"; this gate pins the fixed dataset."""
    from maps_spark.operators.binning import EARTH_RADIUS_KM
    from maps_spark.sources.occurrence import occurrence_cte
    return f"""{occurrence_cte()},
p AS (
  SELECT occurrenceId AS id,
         CAST(decimalLatitude AS DOUBLE) AS lat,
         CAST(decimalLongitude AS DOUBLE) AS lng
  FROM occ
  WHERE occurrenceId % {id_mod} = 0
    AND decimalLatitude IS NOT NULL
    AND decimalLongitude IS NOT NULL),
d AS (
  SELECT a.id AS id_a, b.id AS id_b,
         2 * {float(EARTH_RADIUS_KM)!r} * asin(sqrt(
           sin(radians(b.lat - a.lat) / 2) ^ 2
           + cos(radians(a.lat)) * cos(radians(b.lat))
             * sin(radians(b.lng - a.lng) / 2) ^ 2)) AS dist
  FROM p a JOIN p b ON a.id < b.id)
SELECT id_a, id_b,
       CAST(floor(dist * 1000.0) AS BIGINT) AS dist_m
FROM d WHERE dist <= {float(radius_km)!r}"""


def containment_pairs_select(shingle_k: int = 3, threshold: float = 0.8,
                             scale: int = 1_000_000,
                             max_df: int = 1000) -> str:
    """DuckDB twin of operators.dedup.containment_pairs (same shingle
    CTE family as ngram_jaccard_select)."""
    cut = int(threshold * scale)
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
       CAST(sa.sz AS BIGINT) AS sza, CAST(sb.sz AS BIGINT) AS szb,
       CAST((inter * {scale}) // sa.sz AS BIGINT) AS cont_a_scaled,
       CAST((inter * {scale}) // sb.sz AS BIGINT) AS cont_b_scaled
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE (inter * {scale}) // sa.sz >= {cut}
   OR (inter * {scale}) // sb.sz >= {cut}"""


def event_anomalies_select(baseline_days: int = 7,
                           ratio_threshold: float = 2.0,
                           min_baseline_days: int = 3,
                           scale: int = 1_000_000,
                           day_us: int = 86_400_000_000) -> str:
    """DuckDB twin of operators.sessions.event_anomalies (gap-aware
    RANGE frame over day indices, integer-exact ratio)."""
    cut = int(ratio_threshold * scale)
    return f"""WITH daily AS (
  SELECT event_type,
         CAST(epoch_us(ts) // {day_us} AS BIGINT) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2),
win AS (
  SELECT event_type, day, n,
         CAST(count(n) OVER w AS BIGINT) AS base_days,
         CAST(COALESCE(sum(n) OVER w, 0) AS BIGINT) AS base_sum
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               RANGE BETWEEN {baseline_days} PRECEDING
               AND 1 PRECEDING))
SELECT event_type, day, n, base_days, base_sum,
       CAST(CASE WHEN base_sum > 0
            THEN (n * base_days * {scale}) // base_sum
            ELSE 0 END AS BIGINT) AS ratio_scaled,
       (base_days >= {min_baseline_days}
        AND (CASE WHEN base_sum > 0
             THEN (n * base_days * {scale}) // base_sum
             ELSE 0 END) >= {cut}) AS anomaly
FROM win"""


def _sessioned_events_cte(gap_us: int) -> str:
    """Shared event-grain session-id CTE body (twin of
    operators.sessions._sessioned_events)."""
    return f"""e AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
  FROM events),
flagged AS (
  SELECT user_id, tus, event_id, event_type,
         CASE WHEN lag(tus) OVER (PARTITION BY user_id
                                  ORDER BY tus, event_id) IS NULL
                OR tus - lag(tus) OVER (PARTITION BY user_id
                                        ORDER BY tus, event_id)
                   > {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM e),
sess AS (
  SELECT user_id, tus, event_id, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)"""


def event_transitions_select(gap_us: int) -> str:
    """DuckDB twin of operators.sessions.event_transitions."""
    return f"""WITH {_sessioned_events_cte(gap_us)},
nxt AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id, sid
                                ORDER BY tus, event_id) AS dst
  FROM sess),
pairs AS (
  SELECT src, dst, count(*) AS n_pairs
  FROM nxt WHERE dst IS NOT NULL GROUP BY 1, 2)
SELECT src, dst, CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(sum(n_pairs) OVER (PARTITION BY src) AS BIGINT)
         AS n_src_total
FROM pairs"""


def session_paths_select(gap_us: int, max_len: int = 8,
                         k: int = 50) -> str:
    """DuckDB twin of operators.sessions.session_paths."""
    return f"""WITH {_sessioned_events_cte(gap_us)},
ordered AS (
  SELECT user_id, sid, event_type,
         row_number() OVER (PARTITION BY user_id, sid
                            ORDER BY tus, event_id) AS rn
  FROM sess),
paths AS (
  SELECT user_id, sid,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ordered WHERE rn <= {max_len} GROUP BY user_id, sid)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {k}"""


def _bloom_pos_union(src: str, cols: str, m_bits: int, n_hashes: int,
                     seed: int) -> str:
    """UNION ALL of the n_hashes universal-hash bloom positions for
    every row of ``src`` (twin of operators.corpus._bloom_positions)."""
    from maps_spark.operators.dedup import minhash_perm_consts
    a, b = minhash_perm_consts(n_hashes, seed)
    return " UNION ALL ".join(
        f"SELECT {cols}((h * {int(a[j])} + {int(b[j])}) % {_P31}) "
        f"% {m_bits} AS pos FROM {src}"
        for j in range(n_hashes))


def bloom_contamination_select(bench_mod: int = 25, shingle_k: int = 3,
                               m_bits: int = 1 << 17,
                               n_hashes: int = 3,
                               threshold: float = 0.2,
                               seed: int | None = None,
                               scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.corpus.bloom_contamination with the
    q_contamination benchmark split (doc_id % bench_mod == 0)."""
    from maps_spark.operators.corpus import BLOOM_SEED
    s = BLOOM_SEED if seed is None else seed
    shingle_hash = _TOKEN_HASH.replace("t = ''", "shingle = ''") \
        .replace("string_split(t, '')", "string_split(shingle, '')")
    return f"""WITH bsh AS (
  SELECT DISTINCT shingle FROM {_shingle_cte(
      f"(SELECT * FROM documents WHERE doc_id % {bench_mod} = 0)",
      shingle_k)} y),
bh AS (SELECT DISTINCT {shingle_hash} AS h FROM bsh),
bpos AS ({_bloom_pos_union("bh", "", m_bits, n_hashes, s)}),
bloom AS (
  SELECT pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS w
  FROM bpos GROUP BY 1),
dh AS (
  SELECT DISTINCT doc_id, {shingle_hash} AS h FROM {_shingle_cte(
      f"(SELECT * FROM documents WHERE doc_id % {bench_mod} <> 0)",
      shingle_k)} x),
probes AS ({_bloom_pos_union("dh", "doc_id, h, ", m_bits, n_hashes,
                             s)}),
per_sh AS (
  SELECT doc_id, h,
         min(CASE WHEN w IS NOT NULL
                   AND (w & (CAST(1 AS BIGINT)
                             << CAST(pos % 32 AS INT))) <> 0
              THEN 1 ELSE 0 END) AS sh_hit
  FROM probes LEFT JOIN bloom ON bloom.word = probes.pos // 32
  GROUP BY doc_id, h)
SELECT doc_id, count(*) AS n_shingles,
       CAST(sum(sh_hit) AS BIGINT) AS n_flagged,
       CAST(floor(sum(sh_hit) * {scale} / count(*)) AS BIGINT)
         AS contamination_scaled,
       CAST(floor(sum(sh_hit) * {scale} / count(*)) AS BIGINT)
         >= {int(threshold * scale)} AS flagged
FROM per_sh GROUP BY doc_id"""


def fuzzy_pairs_select(max_dist: int = 8, q: int = 3,
                       key_expr: str = "lower(substr(text, 1, 40))"
                       ) -> str:
    """DuckDB twin of operators.dedup.fuzzy_pairs over the pseudo-title
    ``key_expr`` of the documents table (same q-gram candidate
    generation, same levenshtein verify)."""
    return f"""WITH keyed AS (
  SELECT doc_id AS id, {key_expr} AS k FROM documents),
grams AS (
  SELECT DISTINCT id, g FROM (
    SELECT id,
           unnest(list_transform(
             generate_series(1, greatest(len(k) - {q - 1}, 1)),
             i -> substr(k, i, {q}))) AS g
    FROM keyed) s),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM grams a JOIN grams b ON a.g = b.g AND a.id < b.id)
SELECT c.id_a, c.id_b,
       CAST(levenshtein(ka.k, kb.k) AS INT) AS dist
FROM cand c
JOIN keyed ka ON ka.id = c.id_a
JOIN keyed kb ON kb.id = c.id_b
WHERE abs(len(ka.k) - len(kb.k)) <= {max_dist}
  AND levenshtein(ka.k, kb.k) <= {max_dist}"""


def _kmeans_ctes(p: str, emb_expr: str, k: int, iters: int,
                 scale: int, table: str = "embeddings",
                 train_limit: int | None = None) -> list[str]:
    """CTE chain (prefix ``p``) replaying operators.similarity
    kmeans_fit over ``emb_expr`` (a list expression over the
    embeddings table): scaled components, seed centroids from the
    shared ``ranked`` ordering, then per-iteration assign / update
    with the empty-cluster keep-previous rule. The last CTE
    ``{p}fa`` holds (vec_id, cluster, d2) for the FINAL centroids.

    ``train_limit`` replays pq_encode's bounded-sample training: the
    per-iteration assign/update sees only the ``train_limit`` smallest
    vec_ids (a <= bound against the nth smallest id — ids unique),
    while the final assignment still covers the whole table."""
    trw = ""
    if train_limit is not None:
        trw = (f" WHERE v.vec_id <= (SELECT max(vec_id) FROM "
               f"(SELECT vec_id FROM {table} ORDER BY vec_id "
               f"LIMIT {train_limit}) {p}tl)")
    ctes = [f"""{p}comp AS (
  SELECT vec_id,
         CAST(generate_subscripts({emb_expr}, 1) - 1 AS INT) AS pos,
         unnest({emb_expr}) AS x
  FROM {table}),
{p}scaled AS (
  SELECT vec_id, pos,
         CAST(floor(CAST(x AS DOUBLE) * {float(scale)}) AS BIGINT)
           AS xs
  FROM {p}comp),
{p}c0 AS (
  SELECT r.cluster, s.pos, s.xs
  FROM ranked r JOIN {p}scaled s USING (vec_id)
  WHERE r.cluster < {k})"""]
    for i in range(iters):
        ctes.append(f"""{p}a{i} AS (
  SELECT v.vec_id, c.cluster,
         sum((v.xs - c.xs) * (v.xs - c.xs)) AS d2
  FROM {p}scaled v JOIN {p}c{i} c ON v.pos = c.pos{trw}
  GROUP BY 1, 2),
{p}b{i} AS (
  SELECT vec_id, cluster, d2 FROM {p}a{i}
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY d2, cluster) = 1),
{p}u{i} AS (
  SELECT b.cluster, v.pos,
         CAST(floor(CAST(sum(v.xs) AS DOUBLE) / count(*)) AS BIGINT)
           AS xs
  FROM {p}b{i} b JOIN {p}scaled v USING (vec_id) GROUP BY 1, 2),
{p}c{i + 1} AS (
  SELECT c.cluster, c.pos, COALESCE(u.xs, c.xs) AS xs
  FROM {p}c{i} c LEFT JOIN {p}u{i} u
    ON u.cluster = c.cluster AND u.pos = c.pos)""")
    ctes.append(f"""{p}fa AS (
  SELECT vec_id, cluster, d2 FROM (
    SELECT v.vec_id, c.cluster,
           sum((v.xs - c.xs) * (v.xs - c.xs)) AS d2
    FROM {p}scaled v JOIN {p}c{iters} c ON v.pos = c.pos
    GROUP BY 1, 2) z
  QUALIFY row_number() OVER (PARTITION BY vec_id
                             ORDER BY d2, cluster) = 1)""")
    return ctes


def _ranked_cte(table: str = "embeddings") -> str:
    from maps_spark.operators.corpus import mix_sql
    mix = mix_sql("vec_id")
    return f"""ranked AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY ({mix}), vec_id) - 1 AS cluster
  FROM {table})"""


def kmeans_assign_select(k: int = 8, iters: int = 3,
                         scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.similarity.kmeans_assign: Lloyd's
    unrolled as one CTE chain per iteration (assign -> update with the
    empty-cluster keep-previous rule), same integer arithmetic."""
    ctes = [_ranked_cte()] + _kmeans_ctes("", "embedding", k, iters,
                                          scale)
    return ("WITH " + ",\n".join(ctes) + """
SELECT vec_id, CAST(cluster AS INT) AS cluster,
       CAST(d2 AS BIGINT) AS dist2
FROM fa""")


def _unit_slice_sql(a: int, b: int) -> str:
    """Normalized embedding slice (twin of similarity.unit_vec_col
    applied before the PQ subspace slice): same cast-then-fold norm
    as _NORM, zero-norm vectors pass through."""
    norm = _NORM.format(a="embedding")
    return (f"list_transform(embedding[{a}:{b}], "
            f"v -> CASE WHEN {norm} = 0.0 THEN 0.0 "
            f"ELSE CAST(v AS DOUBLE) / ({norm}) END)")


def pq_codes_select(m: int = 8, n_cent: int = 16, iters: int = 2,
                    dim: int = 64, scale: int = 1_000_000,
                    train_limit: int | None = None) -> str:
    """DuckDB twin of operators.similarity.pq_encode's code table:
    one kmeans chain per subspace over the list slice, same shared
    seed ordering."""
    sub = dim // m
    ctes = [_ranked_cte()]
    for s in range(m):
        ctes += _kmeans_ctes(f"s{s}_",
                             f"{_unit_slice_sql(s * sub + 1, (s + 1) * sub)}",
                             n_cent, iters, scale,
                             train_limit=train_limit)
    union = "\nUNION ALL\n".join(
        f"SELECT vec_id, CAST({s} AS INT) AS subspace, "
        f"CAST(cluster AS INT) AS code, CAST(d2 AS BIGINT) AS dist2 "
        f"FROM s{s}_fa" for s in range(m))
    return "WITH " + ",\n".join(ctes) + "\n" + union


def _pq_chain_parts(n_queries: int, m: int, n_cent: int, iters: int,
                    dim: int, scale: int,
                    train_limit: int | None = None
                    ) -> tuple[list[str], str, str]:
    """(kmeans CTE list, codes-union SQL, lut-union SQL) — the PQ
    building blocks shared by pq_topk_select and ivfpq_topk_select."""
    sub = dim // m
    ctes = [_ranked_cte()]
    for s in range(m):
        ctes += _kmeans_ctes(f"s{s}_",
                             f"{_unit_slice_sql(s * sub + 1, (s + 1) * sub)}",
                             n_cent, iters, scale,
                             train_limit=train_limit)
    codes = "\nUNION ALL\n".join(
        f"SELECT vec_id, {s} AS subspace, cluster AS code "
        f"FROM s{s}_fa" for s in range(m))
    lut = "\nUNION ALL\n".join(
        f"""SELECT q.vec_id AS qid, {s} AS subspace,
       c.cluster AS code, sum((q.xs - c.xs) * (q.xs - c.xs)) AS qd2
FROM s{s}_scaled q JOIN s{s}_c{iters} c ON q.pos = c.pos
WHERE q.vec_id < {n_queries} GROUP BY 1, 2, 3""" for s in range(m))
    return ctes, codes, lut


def pq_topk_select(n_queries: int = 16, k_results: int = 10,
                   m: int = 8, n_cent: int = 16, iters: int = 2,
                   dim: int = 64, scale: int = 1_000_000,
                   train_limit: int | None = None) -> str:
    """DuckDB twin of operators.similarity.pq_topk (ADC): per-query
    LUT against each subspace's FINAL centroids, summed over the code
    table, ranked per query with the (adist2, vec_id) tie-break."""
    ctes, codes, lut = _pq_chain_parts(n_queries, m, n_cent, iters,
                                       dim, scale,
                                       train_limit=train_limit)
    return ("WITH " + ",\n".join(ctes)
            + f""",\ncodes AS ({codes}),\nlut AS ({lut}),
scored AS (
  SELECT l.qid, co.vec_id, CAST(sum(l.qd2) AS BIGINT) AS adist2
  FROM codes co JOIN lut l
    ON l.subspace = co.subspace AND l.code = co.code
  GROUP BY 1, 2)
SELECT qid, vec_id, adist2,
       CAST(row_number() OVER (PARTITION BY qid
                               ORDER BY adist2, vec_id) AS INT)
         AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY qid
                           ORDER BY adist2, vec_id) <= {k_results}"""
            )


def ivfpq_topk_select(n_queries: int = 16, k_results: int = 10,
                      n_clusters: int = 16, n_probe: int = 4,
                      kmeans_iters: int = 2, train_sample: int = 2048,
                      m: int = 8, n_cent: int = 16, iters: int = 2,
                      dim: int = 64, scale: int = 1_000_000,
                      pq_train_limit: int | None = None) -> str:
    """DuckDB twin of operators.similarity.ivfpq_topk: the IVF
    training/assignment chain (casg) + query probes, composed with the
    PQ chains — ADC runs over probed candidates only."""
    ctes, codes, lut = _pq_chain_parts(n_queries, m, n_cent, iters,
                                       dim, scale,
                                       train_limit=pq_train_limit)
    return f"""WITH {_ivf_casg_ctes(dim, n_clusters, kmeans_iters,
                                    train_sample)},
qasg AS (
  SELECT vec_id AS qid, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, c) AS rk
    FROM fdots WHERE vec_id < {n_queries}) z WHERE rk <= {n_probe}),
{",".join(ctes)},
codes AS ({codes}),
lut AS ({lut}),
cand AS (
  SELECT DISTINCT q.qid, n.neighbor_id AS vec_id
  FROM qasg q JOIN casg n USING (c)),
scored AS (
  SELECT l.qid, co.vec_id, CAST(sum(l.qd2) AS BIGINT) AS adist2
  FROM codes co
  JOIN cand ca ON ca.vec_id = co.vec_id
  JOIN lut l ON l.qid = ca.qid AND l.subspace = co.subspace
            AND l.code = co.code
  GROUP BY 1, 2)
SELECT qid, vec_id, adist2,
       CAST(row_number() OVER (PARTITION BY qid
                               ORDER BY adist2, vec_id) AS INT)
         AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY qid
                           ORDER BY adist2, vec_id) <= {k_results}"""


def media_dhash_select(n: int = 64, width: int = 32, height: int = 24,
                       grid_h: int = 8, grid_w: int = 8) -> str:
    """Closed-form twin of operators.multimodal.image_dhash over
    synthesize_ppm_media(pattern="mod")'s modular texture (the
    gradient pattern's rows are monotone -> every dHash bit 0, which
    would gate nothing): nearest-resize samples full-res pixels at
    X = (x*w)//(grid_w+1), Y = (y*h)//grid_h, so the whole
    decode+resize+gray+compare pipeline collapses to the synthesis
    formulas r = ((X*(3+id%5)+7Y)%23)*11, g = ((X^2+Y)%29)*8,
    b = ((3id+X+Y)%31)*8, gray = (r+g+b)//3."""
    return f"""WITH ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
cells AS (
  SELECT media_id, y, x,
         ((((sx * (3 + media_id % 5) + 7 * sy) % 23) * 11
           + ((sx * sx + sy) % 29) * 8
           + ((media_id * 3 + sx + sy) % 31) * 8)) // 3 AS gray
  FROM (SELECT media_id, y, x,
               (x * {width}) // {grid_w + 1} AS sx,
               (y * {height}) // {grid_h} AS sy
        FROM ids, generate_series(0, {grid_h - 1}) ty(y),
             generate_series(0, {grid_w}) tx(x)) q),
bits AS (
  SELECT a.media_id, a.y, a.x,
         CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
  FROM cells a JOIN cells b
    ON b.media_id = a.media_id AND b.y = a.y AND b.x = a.x + 1
  WHERE a.x < {grid_w})
SELECT media_id, 'image' AS kind,
       CAST(sum(CASE WHEN y >= {grid_h // 2} THEN
           bit * (CAST(1 AS BIGINT)
                  << CAST((y - {grid_h // 2}) * {grid_w} + x AS INT))
         ELSE 0 END) AS BIGINT) AS hash_hi,
       CAST(sum(CASE WHEN y < {grid_h // 2} THEN
           bit * (CAST(1 AS BIGINT)
                  << CAST(y * {grid_w} + x AS INT))
         ELSE 0 END) AS BIGINT) AS hash_lo,
       TRUE AS decode_ok
FROM bits GROUP BY media_id"""


def cluster_topics_select(k: int = 8, iters: int = 3, dim: int = 64,
                          top_k: int = 10,
                          scale: int = 1000) -> str:
    """DuckDB twin of operators.corpus.cluster_topics: dense
    hashing-trick vectors rebuilt with the same token hash, then the
    generalized kmeans chain over that derived table, then per-cluster
    word counts ranked with the same tie-break."""
    ctes = [f"""toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t
  FROM documents),
buckets AS (
  SELECT doc_id, CAST(({_TOKEN_HASH}) % {dim} AS INT) AS bucket,
         count(*) AS cnt
  FROM toks WHERE t <> '' GROUP BY 1, 2),
grid AS (SELECT DISTINCT doc_id FROM buckets),
docvecs AS (
  SELECT g.doc_id AS vec_id,
         list(COALESCE(b.cnt, 0) ORDER BY gs.i) AS embedding
  FROM grid g
  CROSS JOIN generate_series(0, {dim - 1}) gs(i)
  LEFT JOIN buckets b ON b.doc_id = g.doc_id AND b.bucket = gs.i
  GROUP BY g.doc_id)""",
            _ranked_cte("docvecs")]
    ctes += _kmeans_ctes("", "embedding", k, iters, scale,
                         table="docvecs")
    return ("WITH " + ",\n".join(ctes) + f""",
wordcnt AS (
  SELECT f.cluster, t.t AS word, count(*) AS cnt
  FROM toks t JOIN fa f ON f.vec_id = t.doc_id
  WHERE t.t <> '' GROUP BY 1, 2)
SELECT CAST(cluster AS INT) AS cluster, word,
       CAST(cnt AS BIGINT) AS cnt,
       CAST(row_number() OVER (PARTITION BY cluster
                               ORDER BY cnt DESC, word) AS INT)
         AS rank
FROM wordcnt
QUALIFY row_number() OVER (PARTITION BY cluster
                           ORDER BY cnt DESC, word) <= {top_k}""")


def dedup_method_overlap_select(jaccard_threshold: float = 0.25,
                                containment_threshold: float = 0.5
                                ) -> str:
    """DuckDB twin of operators.dedup.dedup_method_overlap: every
    member's existing oracle select nested as a tagged subquery, then
    the size/intersection matrix."""
    members = {
        "containment": containment_pairs_select(
            threshold=containment_threshold),
        "minhash": minhash_verify_select(threshold=jaccard_threshold),
        "ngram": ngram_jaccard_select(threshold=jaccard_threshold),
        "simhash": simhash_pairs_select(),
        "winnow": winnow_pairs_select(),
    }
    tagged = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS method, doc_a, doc_b FROM ({sql}) t_{name}"
        for name, sql in members.items())
    return f"""WITH tagged AS ({tagged}),
sizes AS (SELECT method, count(*) AS n FROM tagged GROUP BY 1),
commons AS (
  SELECT a.method AS method_a, b.method AS method_b,
         count(*) AS n_common
  FROM tagged a JOIN tagged b
    ON a.doc_a = b.doc_a AND a.doc_b = b.doc_b
   AND a.method < b.method
  GROUP BY 1, 2)
SELECT sa.method AS method_a, sb.method AS method_b,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common
FROM sizes sa JOIN sizes sb ON sa.method < sb.method
LEFT JOIN commons c
  ON c.method_a = sa.method AND c.method_b = sb.method"""


def media_dhash_pairs_select(n: int = 64, max_hamming: int = 6) -> str:
    """DuckDB twin of dhash_near_pairs over the modular-texture
    images: the oracle is the BRUTE-FORCE popcount pair set, so the
    hash match proves the engine's 8-band blocking is lossless at
    ``max_hamming <= 7`` (pigeonhole), exactly like the geo radius
    gate proves its 3x3 banding."""
    return f"""WITH dh AS ({media_dhash_select(n=n)})
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.hash_hi, b.hash_hi))
            + bit_count(xor(a.hash_lo, b.hash_lo)) AS INT) AS hamming
FROM dh a JOIN dh b ON a.media_id < b.media_id
WHERE bit_count(xor(a.hash_hi, b.hash_hi))
      + bit_count(xor(a.hash_lo, b.hash_lo)) <= {max_hamming}"""


def classifier_eval_select(scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.classify.classifier_eval over the
    nb_classify gate output (self-trained, label = source): per-class
    tp/fp/fn/support and integer-divided precision/recall/F1."""
    s = int(scale)
    return f"""WITH scored AS ({nb_classify_select(scale)}),
lab AS (SELECT doc_id, source AS truth FROM documents),
j AS (SELECT s.pred_label AS pred, l.truth
      FROM scored s JOIN lab l USING (doc_id)),
p AS (SELECT pred AS label, count(*) AS n_pred,
             sum(CASE WHEN pred = truth THEN 1 ELSE 0 END) AS tp
      FROM j GROUP BY 1),
t AS (SELECT truth AS label, count(*) AS support FROM j GROUP BY 1),
m AS (SELECT COALESCE(p.label, t.label) AS label,
             CAST(COALESCE(p.tp, 0) AS BIGINT) AS tp,
             CAST(COALESCE(p.n_pred, 0) - COALESCE(p.tp, 0) AS BIGINT)
               AS fp,
             CAST(COALESCE(t.support, 0) - COALESCE(p.tp, 0) AS BIGINT)
               AS fn,
             CAST(COALESCE(t.support, 0) AS BIGINT) AS support
      FROM p FULL OUTER JOIN t ON p.label = t.label)
SELECT label, tp, fp, fn, support,
       CAST(CASE WHEN tp + fp = 0 THEN 0
                 ELSE (tp * {s}) // (tp + fp) END AS BIGINT)
         AS precision_scaled,
       CAST(CASE WHEN tp + fn = 0 THEN 0
                 ELSE (tp * {s}) // (tp + fn) END AS BIGINT)
         AS recall_scaled,
       CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0
                 ELSE (2 * tp * {s}) // (2 * tp + fp + fn) END
            AS BIGINT) AS f1_scaled
FROM m"""


def collocations_select(min_count: int = 5,
                        scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.corpus.collocations: same staged
    integer-division lift, identical op order."""
    return f"""WITH {_TOKS_CTE},
big AS (
  SELECT doc_id, word AS w1,
         lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks QUALIFY w2 IS NOT NULL),
pair AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair
  FROM big GROUP BY 1, 2 HAVING count(*) >= {min_count}),
uni AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM toks)
SELECT w1, w2, c_pair, u1.c AS c_w1, u2.c AS c_w2,
       CAST(((c_pair * {scale}) // u1.c) * n_tok // u2.c AS BIGINT)
         AS lift_scaled
FROM pair
JOIN uni u1 ON u1.word = pair.w1
JOIN uni u2 ON u2.word = pair.w2
CROSS JOIN n"""


def _prose_ctes() -> str:
    """CTE chain `prose(doc_id, text)` — byte-identical to
    operators.text.synthesize_prose over `documents`."""
    return """_sw AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS w,
         CAST(doc_id % 5 + 4 AS BIGINT) AS slen
  FROM documents),
_sn AS (
  SELECT doc_id, w, slen,
         CAST(floor((greatest(len(w), 1) - 1)
                    / CAST(slen AS DOUBLE)) AS BIGINT) + 1 AS ns
  FROM _sw),
prose AS (
  SELECT doc_id,
         array_to_string(list_transform(
             generate_series(CAST(0 AS BIGINT), ns - 1),
             i -> COALESCE(array_to_string(
                    list_slice(w, i * slen + 1, i * slen + slen), ' '),
                    '')
                  || '.'), ' ') AS text
  FROM _sn)"""


def sentence_split_select() -> str:
    """DuckDB twin of synthesize_prose |> sentence_split."""
    return f"""WITH {_prose_ctes()},
sp AS (
  SELECT doc_id,
         regexp_split_to_array(text, '[.!?]+ +') AS parts
  FROM prose),
ex AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS sent_idx,
         regexp_replace(trim(parts[u.i]), '[.!?]+$', '') AS sentence
  FROM (SELECT doc_id, parts,
               unnest(generate_series(1, len(parts))) AS i
        FROM sp) u(doc_id, parts, i))
SELECT doc_id, sent_idx, sentence,
       CAST(len(list_filter(string_split(sentence, ' '),
                            x -> x <> '')) AS BIGINT) AS n_words,
       CAST(length(sentence) AS BIGINT) AS n_chars
FROM ex WHERE sentence <> ''"""


def readability_select() -> str:
    """DuckDB twin of synthesize_prose |> readability (same staged
    integer divisions)."""
    return f"""WITH {_prose_ctes()},
r0 AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM prose),
r1 AS (
  SELECT doc_id,
         CAST(greatest(len(w), 1) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS n_sentences,
         CAST(COALESCE(list_aggregate(list_transform(w,
                t -> greatest(len(regexp_extract_all(t, '[aeiouy]+')),
                              1)), 'sum'), 0) AS BIGINT) AS n_syllables
  FROM r0)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CAST(206835 - (1015 * n_words) // n_sentences
                   - (84600 * n_syllables) // n_words AS BIGINT)
         AS fre_milli
FROM r1"""


def novelty_score_select(k: int = 8, scale: int = 1_000_000) -> str:
    """DuckDB twin of operators.corpus.novelty_score."""
    return f"""WITH g0 AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents),
g1 AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {k} THEN
           list_transform(generate_series(1, len(w) - {k} + 1),
             i -> array_to_string(list_slice(w, i, i + {k} - 1), ' '))
         ELSE [array_to_string(w, ' ')] END AS grams
  FROM g0),
ex AS (
  SELECT DISTINCT doc_id, unnest(grams) AS g FROM g1),
exn AS (SELECT doc_id, g FROM ex WHERE g <> ''),
dfq AS (SELECT g, count(*) AS df FROM exn GROUP BY 1)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST((sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * {scale})
            // count(*) AS BIGINT) AS novelty_scaled
FROM exn JOIN dfq USING (g) GROUP BY 1"""


def cross_source_dup_select(num_perm: int = 64, bands: int = 16,
                            shingle_k: int = 3, seed: int = 42,
                            max_bucket: int = 1000) -> str:
    """DuckDB twin of operators.dedup.cross_source_dup_matrix."""
    return f"""WITH mp AS (
{minhash_lsh_select(num_perm, bands, shingle_k, seed, max_bucket)}),
s AS (SELECT doc_id, source FROM documents)
SELECT least(sa.source, sb.source) AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM mp
JOIN s sa ON sa.doc_id = mp.doc_a
JOIN s sb ON sb.doc_id = mp.doc_b
GROUP BY 1, 2"""


def _audio_fp_ctes(n: int = 64, n_samples: int = 1024,
                   frame: int = 64) -> str:
    """CTE chain ending in ``fp(media_id, fp, n_bits)`` — closed-form
    twin of wav_frame_features |> audio_fingerprint over the
    synthesized sawtooth."""
    return f"""ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
s AS (SELECT media_id, t,
         (t * (media_id + 3)) % 2048 - 1024 AS v
      FROM ids CROSS JOIN generate_series(0, {n_samples - 1}) g(t)),
fe AS (SELECT media_id, CAST(t // {frame} AS INT) AS frame_idx,
          CAST(sum(v * v) AS BIGINT) AS energy
       FROM s GROUP BY 1, 2),
fb AS (SELECT media_id, frame_idx, energy,
          lead(energy) OVER (PARTITION BY media_id
                             ORDER BY frame_idx) AS nxt
       FROM fe),
fp AS (SELECT media_id,
          CAST(sum(CASE WHEN energy > nxt THEN 1 ELSE 0 END
                   * (CAST(1 AS BIGINT) << frame_idx)) AS BIGINT)
            AS fp,
          CAST(count(*) AS BIGINT) AS n_bits
       FROM fb WHERE nxt IS NOT NULL AND frame_idx < 63
       GROUP BY 1)"""


def audio_fingerprint_select(n: int = 64, n_samples: int = 1024,
                             frame: int = 64) -> str:
    """DuckDB twin of synthesize_wav_media |> wav_frame_features |>
    audio_fingerprint."""
    return (f"WITH {_audio_fp_ctes(n, n_samples, frame)}\n"
            f"SELECT media_id, fp, n_bits FROM fp")


def audio_near_pairs_select(n: int = 64, n_samples: int = 1024,
                            frame: int = 64,
                            max_hamming: int = 3) -> str:
    """DuckDB twin of the banded audio pair join: brute-force popcount
    over all fingerprint pairs (the oracle is the LOSSLESS reference
    the banded join must equal for max_hamming <= 7)."""
    return f"""WITH {_audio_fp_ctes(n, n_samples, frame)}
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
FROM fp a JOIN fp b ON a.media_id < b.media_id
WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}"""


def scene_cuts_select(n: int = 64, width: int = 32, height: int = 24,
                      n_frames: int = 6, num: int = 1,
                      den: int = 2) -> str:
    """Closed-form twin of synthesize_y4m_scene_media |>
    y4m_frame_features |> scene_cuts: difference energy is
    64*width*height exactly at each video's planted jump frame."""
    jump = 64 * width * height
    return f"""WITH ids AS (SELECT i AS media_id
  FROM generate_series(0, {n - 1}) t(i)),
fr AS (SELECT media_id, CAST(f AS INT) AS frame_idx,
          CASE WHEN f = 1 + media_id % {n_frames - 1}
               THEN CAST({jump} AS BIGINT) ELSE 0 END AS diff_energy
       FROM ids CROSS JOIN generate_series(0, {n_frames - 1}) g(f)),
tt AS (SELECT media_id, sum(diff_energy) AS total FROM fr GROUP BY 1)
SELECT fr.media_id, fr.frame_idx, fr.diff_energy,
       (fr.frame_idx > 0 AND tt.total > 0
        AND fr.diff_energy * {den} >= tt.total * {num}) AS is_cut
FROM fr JOIN tt USING (media_id)"""


def bpe_merges_select(n_merges: int = 4,
                      min_pair_count: int = 2) -> str:
    """DuckDB twin of operators.bpe.train_bpe_distributed: the merge
    loop unrolled — per round, adjacent-pair counts over the current
    symbolized vocab, the (count DESC, lexicographic) argmax as a
    one-row CTE, and the leftmost-greedy merge applied with the same
    fold (sentinel-prefixed list_reduce; DuckDB's inclusive negative
    slice [:-2] drops the merged-away last element). The Spark
    trainer's min_pair_count early-stop is modeled by the WHERE on
    each argmax CTE: a sub-threshold round yields an empty b{r},
    the cross join makes every later vocab empty, and the UNION
    emits exactly the rounds the Spark loop emitted."""
    ctes = _bpe_trainer_ctes(n_merges, min_pair_count)
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, lhs, rhs, "
        f"c AS pair_count FROM b{r}" for r in range(n_merges))
    return "WITH " + ",\n".join(ctes) + "\n" + sel


def _bpe_trainer_ctes(n_merges: int, min_pair_count: int) -> list:
    """The unrolled BPE-trainer CTE chain shared by the merges and
    tokenize oracles. Every v{r} is MATERIALIZED: v{r} is referenced
    twice (pair counts + next vocab), and DuckDB inlines plain CTEs
    per reference, which at large n_merges makes the plan tree — and
    its parquet scans — grow exponentially."""
    ctes = [_TOKS_CTE,
            "wc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt "
            "FROM toks GROUP BY 1)",
            "v0 AS MATERIALIZED (SELECT list_append("
            "string_split(word, ''), '</w>') AS sym, cnt FROM wc)"]
    for r in range(n_merges):
        ctes.append(f"""p{r} AS (
  SELECT u.l AS lhs, u.r2 AS rhs, CAST(sum(cnt) AS BIGINT) AS c
  FROM (SELECT cnt,
               unnest(list_transform(generate_series(1, len(sym) - 1),
                 i -> struct_pack(l := sym[i], r2 := sym[i + 1]))) AS u
        FROM v{r} WHERE len(sym) >= 2) q
  GROUP BY 1, 2),
b{r} AS MATERIALIZED (SELECT lhs, rhs, c FROM p{r}
         WHERE c >= {min_pair_count}
         ORDER BY c DESC, lhs, rhs LIMIT 1),
v{r + 1} AS MATERIALIZED (
  SELECT list_reduce(
           [[chr(1)]] || list_transform(v.sym, x -> [x]),
           (acc, x) -> CASE WHEN acc[-1] = b.lhs AND x[1] = b.rhs
                       THEN list_append(acc[:-2], b.lhs || b.rhs)
                       ELSE list_append(acc, x[1]) END)[2:] AS sym,
         v.cnt
  FROM v{r} v CROSS JOIN b{r} b)""")
    return ctes


def bpe_tokenize_select(n_merges: int = 100,
                        min_pair_count: int = 2) -> str:
    """State-machine twin of operators.bpe.bpe_encode over merges
    learned by the same unrolled trainer: a RECURSIVE CTE replays
    encode_word exactly — per step, look up every adjacent pair's
    rank in the merge map, take the leftmost occurrence of the
    minimum rank, splice the merged token, repeat until no learned
    pair remains. One-merge-at-a-time is equivalent to the batch
    form because any pair created by a merge was learned later (its
    rank is strictly higher), so the pending minimum never changes.
    Output matches bpe_encode: (doc_id, n_tokens, n_bpe_tokens,
    bpe_text)."""
    ctes = _bpe_trainer_ctes(n_merges, min_pair_count)
    ranks_union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, lhs, rhs FROM b{r}"
        for r in range(n_merges))
    ctes.append(f"ranks AS MATERIALIZED ({ranks_union})")
    # chr(1) joins pair keys; learned tokens come from corpus words,
    # which are space-split text and never contain control bytes
    ctes.append("""rmap AS MATERIALIZED (
  SELECT map(list(lhs || chr(1) || rhs ORDER BY rank),
             list(rank ORDER BY rank)) AS m FROM ranks)""")
    ctes.append("""enc AS (
  SELECT word, 0 AS k,
         list_append(string_split(word, ''), '</w>') AS sym
  FROM (SELECT DISTINCT word FROM toks)
  UNION ALL
  SELECT word, k + 1,
         sym[1:pos - 1] || [sym[pos] || sym[pos + 1]] || sym[pos + 2:]
  FROM (
    SELECT word, k, sym, list_position(pr, list_min(pr)) AS pos
    FROM (
      SELECT e.word, e.k, e.sym,
             list_transform(generate_series(1, len(e.sym) - 1),
               i -> (m[e.sym[i] || chr(1) || e.sym[i + 1]])[1]) AS pr
      FROM enc e CROSS JOIN rmap) q1) q2
  WHERE pos IS NOT NULL)""")
    ctes.append("""fin AS (
  SELECT word, sym FROM (
    SELECT word, sym,
           row_number() OVER (PARTITION BY word ORDER BY k DESC) AS rn
    FROM enc) WHERE rn = 1)""")
    return ("WITH RECURSIVE " + ",\n".join(ctes) + """
SELECT d.doc_id,
       CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(t.n_bpe, 0) AS BIGINT) AS n_bpe_tokens,
       coalesce(t.bpe_text, '') AS bpe_text
FROM documents d
LEFT JOIN (
  SELECT doc_id, count(*) AS n_tokens,
         sum(len(f.sym)) AS n_bpe,
         string_agg(array_to_string(f.sym, ' '), ' '
                    ORDER BY pos) AS bpe_text
  FROM toks JOIN fin f USING (word)
  GROUP BY doc_id) t USING (doc_id)""")
