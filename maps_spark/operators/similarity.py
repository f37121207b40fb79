"""Similarity search over embedding columns (array<float>).

Two paths:

- ``brute_force_topk``: exact cosine top-k — broadcast the query set,
  score every corpus vector JVM-side (zip_with/aggregate Column math,
  no Python), window row_number per query. The right baseline and the
  correct choice whenever |queries| * |corpus| work fits the cluster.
- ``lsh_topk``: random-hyperplane LSH (sign sketch) — corpus and query
  vectors bucketed by sketch prefix; only same-bucket candidates are
  scored. The 100 TB path: the candidate join is an equi-join on bucket
  key, so the shuffle is O(candidates), not O(n*q). Probing multiple
  rotated sketches trades recall for cost.

Cosine is computed as ``floor(scale * dot / (na * nb))`` exact-integer
when oracle parity is needed (`cosine_scaled`), plain double otherwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import pandas_udf


def _dot(a: str | Column, b: str | Column) -> Column:
    # cast BEFORE multiplying: float*float then widen loses bits vs the
    # oracle's double*double; fold left with 0.0 seed (0.0 + x == x, so
    # this matches DuckDB list_reduce's first-element seeding exactly)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(a: str | Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v))


def cosine_col(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """Exact top-k neighbours for each query vector.

    Output: (query_id, neighbor_id, rank, cos_scaled) where cos_scaled =
    floor(1e9 * cosine) (exact integer — deterministic ordering and
    oracle-safe). Self-matches excluded.
    """
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("qvec")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"))
    scored = (c.crossJoin(q)
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.floor(cosine_col("qvec", "cvec") * 1e9)
                      .cast("long").alias("cos_scaled")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_scaled").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_scaled"))


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).astype(np.float64)


def sketch_col(vec: str | Column, planes: np.ndarray) -> Column:
    """Random-hyperplane sign sketch as pure Column math (JVM-side).

    One sign bit per hyperplane, dot products as the same cast-then-
    left-fold used by :func:`cosine_col`, so the identical expression
    (same literals, same summation order) runs in DuckDB SQL — the LSH
    bucket keys are oracle-checkable bit-for-bit. No Python boundary:
    the sketch stays inside codegen next to the scan, which also beats
    the Arrow round-trip a pandas-UDF sketch would pay.
    """
    key = F.lit(0).cast("long")
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        key = key + F.when(_dot(vec, plane) > 0,
                           F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return key


def sketch_udf(planes_list: list[np.ndarray]):
    """Arrow UDF computing every table's sign-sketch key in one pass:
    the dots are :func:`_fold_dots` (explicit dimension-order left fold,
    bit-identical to the Column/DuckDB ``aggregate`` fold — the same
    equivalence the hash-checked IVF assignment relies on), so the keys
    match :func:`sketch_col` exactly at vectorized speed. Returns
    array<long>, one bucket key per table."""
    @pandas_udf("array<long>")
    def _sk(vecs: pd.Series) -> pd.Series:
        if not len(vecs):  # empty Arrow batch (empty partition)
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        keys = []
        for planes in planes_list:
            dots = _fold_dots(m, planes)  # (rows, n_bits), fold order
            bits = (dots > 0).astype(np.int64)
            keys.append(bits @ (1 << np.arange(planes.shape[0],
                                               dtype=np.int64)))
        return pd.Series(list(np.stack(keys, axis=1)))
    return _sk


def _sketch_table(df: DataFrame, id_col: str, vec_col: str,
                  out_id: str, out_vec: str, dim: int, n_bits: int,
                  n_tables: int, seed0: int) -> DataFrame:
    """(id, vec, b0..b{n-1}) — ALL tables' sketches computed in ONE scan
    and pinned with localCheckpoint. Without the barrier every
    downstream use — bucket-size cap, self-join sides, per-table probes
    — re-evaluates the sketches, turning n_tables sketches into
    ~4*n_tables full passes over the corpus. One scan + a materialized
    sketch table is the 100 TB shape (and what a real deployment would
    persist next to the vectors, cf. :mod:`maps_spark.sources.ann_index`).

    Trade-off (deliberate): the localCheckpoint barrier is eager and
    non-reliable (lineage truncated; storage pinned for the session) —
    right for local/gate runs; a cluster deployment persists the
    sketch table as a real staged table instead (ann_index does
    exactly that)."""
    planes = [_hyperplanes(dim, n_bits, seed=seed0 + t)
              for t in range(n_tables)]
    keyed = df.select(F.col(id_col).alias(out_id),
                      F.col(vec_col).alias(out_vec),
                      sketch_udf(planes)(F.col(vec_col)).alias("bs"))
    return keyed.select(
        out_id, out_vec,
        *[F.element_at("bs", t + 1).alias(f"b{t}")
          for t in range(n_tables)]).localCheckpoint()


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             dim: int = 64, n_bits: int = 12, n_tables: int = 4
             ) -> DataFrame:
    """Approximate top-k: random-hyperplane buckets, multi-table probe.

    Each of ``n_tables`` independent sketches buckets both sides; the
    candidate set is the union of same-bucket matches, then exact cosine
    rescoring. Recall is tested against brute force in the test suite.
    All sketches are computed in one corpus scan (:func:`_sketch_table`).
    """
    cs = _sketch_table(corpus, id_col, vec_col, "neighbor_id", "cvec",
                       dim, n_bits, n_tables, seed0=1000)
    qs = _sketch_table(queries, id_col, vec_col, "query_id", "qvec",
                       dim, n_bits, n_tables, seed0=1000)
    # one exploded broadcast join for all tables instead of n_tables
    # sequential probes (each re-scanned the corpus sketch table; the
    # candidate set — same-bucket-in-the-same-table matches — is
    # identical), and the cosine is scored BEFORE the cross-table
    # dedup so that exchange carries one long per row, not two raw
    # vectors (it is a function of the pair, so dedup-then-score and
    # score-then-dedup agree)
    cb = cs.select("neighbor_id", "cvec", F.posexplode(F.array(
        *[F.col(f"b{t}") for t in range(n_tables)])).alias("tbl",
                                                           "bucket"))
    qb = qs.select("query_id", "qvec", F.posexplode(F.array(
        *[F.col(f"b{t}") for t in range(n_tables)])).alias("tbl",
                                                           "bucket"))
    scored = (cb.join(F.broadcast(qb), ["tbl", "bucket"])
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.floor(cosine_col("qvec", "cvec") * 1e9)
                      .cast("long").alias("cos_scaled"))
              .dropDuplicates(["query_id", "neighbor_id"]))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_scaled").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_scaled"))


IVF_QUANT = 1 << 20  # centroid-mean quantization scale (see ivf_centroids)


def _fold_dots(m: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(rows, clusters) dot products accumulated dimension-by-dimension
    — an explicit left fold with 0.0 seed, NOT BLAS ``@`` (whose
    pairwise/SIMD summation order is implementation-defined). This
    makes every dot bit-identical to a DuckDB ``list_reduce`` over the
    same operands, which is what lets the IVF index be hash-checked."""
    sims = np.zeros((m.shape[0], cent.shape[0]), dtype=np.float64)
    for j in range(m.shape[1]):
        sims += m[:, j:j + 1] * cent[None, :, j]
    return sims


def _fold_norms(m: np.ndarray) -> np.ndarray:
    acc = np.zeros(m.shape[0], dtype=np.float64)
    for j in range(m.shape[1]):
        acc += m[:, j] * m[:, j]
    return np.sqrt(acc)


def ivf_centroids(train: np.ndarray, n_clusters: int, kmeans_iters: int
                  ) -> np.ndarray:
    """Deterministic, engine-reproducible mini k-means (spherical).

    Every step is defined so an independent SQL engine reproduces the
    centroids bit-for-bit from the same train sample:

    - init: centroids are the normalized train vectors at ranks
      ``floor(i*(n-1)/(k-1))`` — order statistics, no RNG;
    - assignment: argmax of left-fold dot products, ties to the lowest
      cluster id;
    - update: member means are computed from vectors QUANTIZED to
      integers (``floor(nv*2^20 + 0.5)``) and summed as int64 — integer
      sums are order-independent and exact, so the mean does not depend
      on aggregation order (a float sum would differ between engines
      by summation order); the mean is then re-normalized with a
      left-fold norm. Empty clusters keep their previous centroid.
    """
    n = len(train)
    nv = train / np.maximum(_fold_norms(train), 1e-12)[:, None]
    q = np.floor(nv * IVF_QUANT + 0.5).astype(np.int64)
    k = min(n_clusters, n)
    idx = [(i * (n - 1)) // (k - 1) if k > 1 else 0 for i in range(k)]
    cent = nv[idx].copy()
    for _ in range(kmeans_iters):
        assign = _fold_dots(nv, cent).argmax(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                mean = q[mask].sum(axis=0).astype(np.float64) \
                    / (int(mask.sum()) * IVF_QUANT)
                nrm = _fold_norms(mean[None, :])[0]
                cent[c] = mean / max(nrm, 1e-12)
    return cent


def cluster_assign_udf(cent: np.ndarray, top_n: int):
    """Arrow UDF assigning each vector its ``top_n`` nearest centroids
    (raw left-fold dots: same argmax as cosine — positive per-row scale
    — and the fold matches the oracle exactly; ties to lowest id)."""
    @pandas_udf("array<int>")
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        sims = _fold_dots(m, cent)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :top_n]
        return pd.Series([row.astype(np.int32) for row in order])
    return _assign


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_clusters: int = 16, n_probe: int = 4, kmeans_iters: int = 2,
             train_sample: int = 2048) -> DataFrame:
    """IVF approximate top-k: the inverted-file scale path.

    Train: a deterministic driver-side mini k-means over the first
    ``train_sample`` vectors (ordered by id — reproducible, see
    :func:`ivf_centroids`) yields the coarse centroids; the centroid
    table is tiny and broadcast.
    Search: corpus vectors are assigned to their nearest centroid (one
    vectorized Arrow pass); each query probes its ``n_probe`` nearest
    centroids, and only same-cluster candidates are scored — the
    candidate join is an equi-join on cluster id, so shuffle volume is
    O(corpus / n_clusters * n_probe) per query instead of O(corpus).
    """
    train = np.array(
        [r[0] for r in corpus.select(vec_col).orderBy(id_col)
         .limit(train_sample).collect()], dtype=np.float64)
    cent = ivf_centroids(train, n_clusters, kmeans_iters)
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        F.element_at(cluster_assign_udf(cent, 1)(F.col(vec_col)), 1)
        .alias("cluster"))
    qb = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        F.explode(cluster_assign_udf(cent, n_probe)(F.col(vec_col)))
        .alias("cluster"))
    scored = (cb.join(F.broadcast(qb), "cluster")
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.floor(cosine_col("qvec", "cvec") * 1e9).cast("long")
                      .alias("cos_scaled")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_scaled").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_scaled"))


def ann_recall(corpus: DataFrame, queries: DataFrame, k: int = 10,
               method: str = "ivf", id_col: str = "vec_id",
               vec_col: str = "embedding", **kwargs) -> DataFrame:
    """Retrieval-quality evaluation: per-query recall@k of an
    approximate index (``method`` = 'lsh' or 'ivf', extra kwargs pass
    through to :func:`lsh_topk` / :func:`ivf_topk`) against the exact
    :func:`brute_force_topk` answer.

    Output: (query_id, n_exact, n_hits) — both counts are integers,
    so the result is oracle-exact (recall@k = n_hits / n_exact).

    Scale note: the exact side is the O(corpus x queries) brute-force
    scan, so this is an EVALUATION operator — run it on a sampled
    query set (hundreds, not millions) to track index quality per
    build; the approximate side is the same bucketed plan production
    uses, so the measured recall is the served recall.
    """
    exact = brute_force_topk(corpus, queries, k, id_col, vec_col)
    if method == "lsh":
        approx = lsh_topk(corpus, queries, k, id_col, vec_col, **kwargs)
    elif method == "ivf":
        approx = ivf_topk(corpus, queries, k, id_col, vec_col, **kwargs)
    elif method == "pq":
        # the ADC scan does not exclude self-matches (brute force
        # does), so ask for k+1, drop self, and re-rank to k — the
        # honest recall@k of the PQ-compressed index
        raw = pq_topk(corpus, queries, k_results=k + 1,
                      id_col=id_col, vec_col=vec_col, **kwargs)
        w = Window.partitionBy("qid").orderBy("adist2", "vec_id")
        approx = (raw.where(F.col("vec_id") != F.col("qid"))
                  .withColumn("r2", F.row_number().over(w))
                  .where(F.col("r2") <= k)
                  .select(F.col("qid").alias("query_id"),
                          F.col("vec_id").alias("neighbor_id")))
    else:
        raise ValueError(f"unknown ANN method {method!r}")
    return recall_counts(exact, approx)


def recall_counts(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query hit counting shared by every recall gate (incl. the
    served-index one): both inputs are (query_id, neighbor_id, ...)
    top-k tables; output (query_id, n_exact, n_hits)."""
    hits = (approx.select("query_id", "neighbor_id")
            .withColumn("hit", F.lit(1)))
    return (exact.select("query_id", "neighbor_id")
            .join(hits, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_exact"),
                 F.count("hit").alias("n_hits")))


def embedding_near_dupes(emb: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         dim: int = 64, n_bits: int = 12, n_tables: int = 4,
                         max_bucket: int = 10_000) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold.

    Multi-table sign-sketch blocking (same shape as :func:`lsh_topk`):
    ``n_tables`` independent ``n_bits``-bit random-hyperplane sketches
    each bucket the corpus; same-bucket pairs from any table form the
    candidate set, then exact cosine rescoring. More tables -> higher
    recall; more bits -> smaller buckets. At billion-vector scale raise
    ``n_bits`` to ~24 so expected bucket size stays O(100).

    Buckets larger than ``max_bucket`` are dropped before the self-join
    (boilerplate/zero-vector guard — a hot bucket is O(bucket^2) join
    rows). The cap bounds worst-case work at
    ``n_tables * n_buckets * max_bucket^2``. All sketches come from one
    corpus scan (:func:`_sketch_table`).
    """
    from maps_spark.operators.dedup import cap_buckets

    sk = _sketch_table(emb, id_col, vec_col, "id", "v",
                       dim, n_bits, n_tables, seed0=99)
    thr = int(threshold * 1e9)
    # all tables through ONE exploded equi-join on (tbl, bucket)
    # instead of n_tables sequential {cap agg + self-join} jobs (guide
    # §2.4; same restructure and pair-set equivalence argument as
    # multimodal.dhash_near_pairs: a (tbl, bucket) group here IS table
    # t's bucket there, so the cap predicate and the candidate set
    # match). The cosine is a function of the pair, so scoring before
    # the cross-table dedup narrows that exchange from two raw vectors
    # per row to one long — and drops sub-threshold rows with it.
    expl = sk.select("id", "v", F.posexplode(F.array(
        *[F.col(f"b{t}") for t in range(n_tables)])).alias("tbl",
                                                           "bucket"))
    capped = cap_buckets(expl, ["tbl", "bucket"], max_bucket)
    x, y = capped.alias("x"), capped.alias("y")
    cands = (x.join(y, ["tbl", "bucket"])
             .where(F.col("x.id") < F.col("y.id"))
             .select(F.col("x.id").alias("doc_a"),
                     F.col("y.id").alias("doc_b"),
                     F.col("x.v").alias("va"), F.col("y.v").alias("vb")))
    return (cands.select("doc_a", "doc_b",
                         F.floor(cosine_col("va", "vb") * 1e9)
                         .cast("long").alias("cos_scaled"))
            .where(F.col("cos_scaled") >= thr)
            .dropDuplicates(["doc_a", "doc_b"]))


def semantic_dedup(emb: DataFrame, threshold: float = 0.3,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_clusters: int = 16, kmeans_iters: int = 2,
                   train_sample: int = 2048,
                   max_cluster: int = 100_000) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space, then compare pairs
    only WITHIN a cluster — a vector is a duplicate iff some
    lower-id cluster-mate has cosine >= ``threshold`` with it.

    Uses the same deterministic, engine-reproducible k-means as
    :func:`ivf_topk` (:func:`ivf_centroids`), so the verdicts are
    hash-checkable against a SQL oracle. The keep rule (lowest id in
    each near-dup neighborhood wins) is order-free and deterministic —
    unlike greedy sequential SemDeDup it needs no iteration order.

    Scale: the only corpus-sized work is one Arrow assignment pass and
    one equi-join on cluster id; per-cluster cost is O(|c|^2), so
    ``n_clusters`` must grow with the corpus (SemDeDup uses ~50k
    clusters at billion scale; expected |c| a few thousand keeps the
    self-join cheap). Clusters larger than ``max_cluster`` are dropped
    from pairing (their members are all kept) — the degenerate-cluster
    guard, same role as ``cap_buckets`` in the LSH family.

    Output: (vec_id, cluster, dup_of, is_dup) — one row per input
    vector; ``dup_of`` is the smallest qualifying cluster-mate id.
    """
    train = np.array(
        [r[0] for r in emb.select(vec_col).orderBy(id_col)
         .limit(train_sample).collect()], dtype=np.float64)
    cent = ivf_centroids(train, n_clusters, kmeans_iters)
    asg = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        F.element_at(cluster_assign_udf(cent, 1)(F.col(vec_col)), 1)
        .alias("cluster")).localCheckpoint()
    sizes = asg.groupBy("cluster").agg(F.count("*").alias("_cn"))
    pairable = (asg.join(F.broadcast(sizes), "cluster")
                .where(F.col("_cn") <= max_cluster).drop("_cn"))
    a, b = pairable.alias("a"), pairable.alias("b")
    thr = int(threshold * 1e9)
    dup = (a.join(b, "cluster")
           .where(F.col("a.vec_id") < F.col("b.vec_id"))
           .where(F.floor(cosine_col("a.v", "b.v") * 1e9)
                  .cast("long") >= thr)
           .groupBy(F.col("b.vec_id").alias("vec_id"))
           .agg(F.min(F.col("a.vec_id")).alias("dup_of")))
    return (asg.join(dup, "vec_id", "left")
            .select("vec_id", "cluster", "dup_of",
                    F.col("dup_of").isNotNull().alias("is_dup")))


def token_hash_col(t: Column) -> Column:
    """31-bit Mersenne polynomial token hash as a pure Column fold —
    the JVM twin of the oracle's ``_TOKEN_HASH``: code points base-256
    mod 2^31-1, empty -> 0. Runs inside codegen; no Python.

    Scope: agrees with ``dedup._token_hashes`` (and the DuckDB twin)
    for ASCII tokens ONLY — this fold takes one base-256 step per CODE
    POINT (``ascii()``), while ``_token_hashes`` folds UTF-8 BYTES
    (several steps per non-ASCII char). Do not cross-join this hash
    family with the byte-fold family over non-ASCII text; the gated
    pipelines keep each family on its own side."""
    from maps_spark.operators.dedup import P31
    return F.when(t == "", F.lit(0).cast("long")).otherwise(
        F.aggregate(F.split(t, ""), F.lit(0).cast("long"),
                    lambda h, c: (h * 256 + F.ascii(c)) % P31))


def doc_vector_buckets(docs: DataFrame, dim: int = 64,
                       text_col: str = "text") -> DataFrame:
    """Feature-hashing ("hashing trick") term counts: every token maps
    to ``token_hash % dim`` and the per-(doc, bucket) counts ARE the
    document's sparse vector — the dependency-free way to give raw
    text an embedding column the ANN/near-dup family can consume.
    Exact integers, one (doc, bucket) shuffle with map-side combine.

    Output: (doc_id, bucket, cnt) — sparse entries only.
    """
    toks = (docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("t"))
        .where(F.col("t") != ""))
    return (toks.select(
        "doc_id",
        (token_hash_col(F.col("t")) % dim).cast("int").alias("bucket"))
        .groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt")))


def dense_count_vectors(docs: DataFrame, dim: int = 64,
                        text_col: str = "text") -> DataFrame:
    """Sparse hashing-trick counts zero-filled into a dense array:
    (doc_id, counts array<long>) — the shared densification step
    under :func:`hashed_doc_vectors` (which normalizes on top) and
    :func:`maps_spark.operators.corpus.doc_dense_vectors` (which
    feeds k-means raw). Documents with no tokens have no row."""
    sparse = doc_vector_buckets(docs, dim, text_col)
    m = (sparse.groupBy("doc_id")
         .agg(F.map_from_entries(
             F.collect_list(F.struct("bucket", "cnt"))).alias("m")))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("m", i.cast("int")),
                             F.lit(0).cast("long")))
    return m.select("doc_id", dense.alias("counts"))


def hashed_doc_vectors(docs: DataFrame, dim: int = 64,
                       text_col: str = "text") -> DataFrame:
    """Dense L2-normalized hashed term-count vectors: (doc_id,
    embedding array<float>) — drop-in input for
    :func:`brute_force_topk` / :func:`lsh_topk` / :func:`ivf_topk` /
    :func:`semantic_dedup`, deriving the vector column from text with
    NO Python and no model dependency. Documents with identical token
    multisets get identical vectors (cosine 1.0)."""
    base = dense_count_vectors(docs, dim, text_col)
    # hoist the norm to its own column so it evaluates once per row,
    # not once per array element inside the normalize lambda
    d = base.select(
        "doc_id",
        F.transform(F.col("counts"),
                    lambda x: x.cast("double")).alias("d")
    ).withColumn("nrm", F.greatest(_norm(F.col("d")), F.lit(1e-12)))
    vec = F.transform(F.col("d"),
                      lambda x: (x / F.col("nrm")).cast("float"))
    return d.select("doc_id", vec.alias("embedding"))


def _scaled_components(emb: DataFrame, label_col: str, vec_col: str,
                       scale: int) -> DataFrame:
    """(vec_id, label, pos, xs): embedding components floored to
    integers at ``scale`` — float->double widening then one IEEE
    multiply, bit-identical in every engine, so downstream sums are
    exact in any order."""
    return emb.select(
        "vec_id", F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "x")).select(
        "vec_id", "label", "pos",
        F.floor(F.col("x").cast("double") * F.lit(float(scale)))
        .cast("long").alias("xs"))


def embedding_profile(emb: DataFrame, label_col: str = "label",
                      vec_col: str = "embedding",
                      scale: int = 1_000_000) -> DataFrame:
    """Per-group dimension-wise embedding sums — the embedding-QA
    profile (drifted source? dead dimensions? collapsed clusters?)
    as one (label, pos) aggregation with map-side combine. Sums stay
    integers (no division), so consumers derive means at whatever
    precision they need and the oracle matches bitwise.

    Output: (label, pos, n_vecs, sum_scaled)."""
    return (_scaled_components(emb, label_col, vec_col, scale)
            .groupBy("label", "pos")
            .agg(F.count("*").alias("n_vecs"),
                 F.sum("xs").cast("long").alias("sum_scaled")))


def embedding_outliers(emb: DataFrame, label_col: str = "label",
                       vec_col: str = "embedding",
                       scale: int = 1_000_000) -> DataFrame:
    """Exact distance of every vector from its group centroid, for
    outlier triage: reports ``sum_pos (n*x_s - S_pos)^2`` — the
    squared distance to the mean multiplied through by n^2, which
    keeps everything in BIGINT arithmetic (no division, no float
    accumulation), so ranking within a group is exact and the oracle
    hashes bitwise. Divide by ``n^2 * scale^2`` for the geometric
    value.

    Exactness bound: ``n * scale * |x|`` must stay well under 2^31 so
    the square fits int64 — the verification-mode regime (bounded
    audit samples); a production sweep over billion-row groups would
    use the float centroid from :func:`embedding_profile` instead.

    Output: (vec_id, label, dist2_n2)."""
    comp = _scaled_components(emb, label_col, vec_col, scale)
    cent = (comp.groupBy("label", "pos")
            .agg(F.count("*").alias("n"), F.sum("xs").alias("s")))
    t = (F.col("n") * F.col("xs") - F.col("s"))
    return (comp.join(cent, ["label", "pos"])
            .groupBy("vec_id", "label")
            .agg(F.sum(t * t).cast("long").alias("dist2_n2")))


def _kmeans_seed_ids(emb: DataFrame, k: int,
                     id_col: str = "vec_id") -> list[int]:
    """Deterministic seed choice: the k ids with the smallest mixed
    hash (corpus._mix — RNG-free, oracle-replicable ordering)."""
    from maps_spark.operators.corpus import _mix
    rows = (emb.select(F.col(id_col).alias("vec_id"))
            .withColumn("mx", _mix(F.col("vec_id")))
            .orderBy("mx", "vec_id").limit(k).collect())
    return [r["vec_id"] for r in rows]


def _centroid_d2(sv_col: str, cent: list[int]) -> Column:
    """Exact integer squared distance of a scaled int vector column to
    one centroid literal — THE arithmetic every k-means/PQ gate pins
    (cast order and fold included); keep all callers on this one
    helper so build-time, upsert-time, and LUT encodings can never
    drift apart."""
    arr = F.array(*[F.lit(int(v)) for v in cent])
    return F.aggregate(
        F.zip_with(sv_col, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 3,
               vec_col: str = "embedding", id_col: str = "vec_id",
               scale: int = 1_000_000
               ) -> tuple[list[list[int]], DataFrame]:
    """Distributed Lloyd's k-means over an embedding column, in EXACT
    integer arithmetic so the oracle hash-matches: components floor to
    ``scale``-scaled BIGINTs (the :func:`embedding_profile` scaling),
    distances are integer sums of squared diffs, and centroid updates
    are ``floor(sum / n)`` — every quantity < 2^53, IEEE/BIGINT-exact
    in Spark, DuckDB, and the driver alike.

    The canonical Spark k-means shape (what MLlib does under the
    hood): per iteration ONE full pass — assignment is a vectorized
    Arrow batch against the k centroids captured in the closure (no
    join, no explode; see :func:`_pq_codes_arrow` for why numpy beats
    the interpreted Column lambdas here), the update pre-aggregates
    (cluster, pos) integer sums inside the same pass (map-side
    combine), and only k x dim numbers come back to the driver. Empty
    clusters keep their previous centroid (same rule as
    :func:`ivf_centroids`). Seeds are the k lowest-mixed-hash ids —
    deterministic, and the same ordering the oracle's window uses.

    Returns ``(centroids, assignments)``: the k x dim integer-scaled
    codebook, and a (vec_id, cluster, dist2) DataFrame — the
    final-iteration assignment with its exact scaled squared distance.
    """
    import math
    sv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * float(scale)).cast("long"))
    base = (emb.select(F.col(id_col).alias("vec_id"), sv.alias("sv"))
            .persist())
    try:
        seed_ids = _kmeans_seed_ids(emb, k, id_col)
        seed_rows = {r["vec_id"]: list(r["sv"]) for r in
                     base.where(F.col("vec_id").isin(seed_ids))
                     .collect()}
        cent = [seed_rows[i] for i in seed_ids]
        # assignment + update run through the shared Arrow helpers
        # (the m=1 case of the PQ pass): identical integers to the
        # Column formulation, without k * dim interpreted lambda
        # evaluations per row — see _pq_codes_arrow
        flat = base.select("vec_id", F.col("sv").alias("sv0"))
        for _ in range(iters):
            upd = _pq_train_update(flat, [cent])
            nxt = [list(c) for c in cent]
            for r in upd:
                nxt[r["cluster"]][r["pos"]] = math.floor(
                    r["sm"] / r["n"])
            cent = nxt
        assign = (_pq_codes_arrow(flat, [cent])
                  .select("vec_id", F.col("code").alias("cluster"),
                          "dist2"))
        return cent, assign
    finally:
        base.unpersist()


def kmeans_assign(emb: DataFrame, k: int = 8, iters: int = 3,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  scale: int = 1_000_000) -> DataFrame:
    """:func:`kmeans_fit`'s assignment table alone — the gate surface:
    (vec_id, cluster, dist2)."""
    return kmeans_fit(emb, k, iters, vec_col, id_col, scale)[1]


def unit_vec_col(vec_col: str | Column) -> Column:
    """L2-normalized copy of an embedding column in double math (the
    same cast-then-left-fold norm the cosine gates use, so the oracle
    reproduces it bitwise); all-zero vectors pass through unchanged
    instead of dividing by zero."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    nrm = _norm(c)
    return F.transform(
        c, lambda x: F.when(nrm == 0.0, F.lit(0.0))
        .otherwise(x.cast("double") / nrm))


def _pq_codes_arrow(base: DataFrame,
                    cent: list[list[list[int]]]) -> DataFrame:
    """Nearest-centroid PQ assignment as ONE Arrow pass.

    The Column formulation (array_min over per-centroid
    :func:`_centroid_d2` structs, per subspace) is m * n_cent
    interpreted higher-order-function
    aggregates PER ROW — Spark does not codegen lambda functions, so
    at m=8, n_cent=16 that is ~1024 boxed lambda evaluations per
    vector and the encode pass dominates every PQ workload (~26 s for
    8k vectors measured locally, flat in corpus size because it is
    pure interpretation overhead). This helper computes the identical
    integers in numpy over Arrow batches: d2 is the same int64
    sum-of-squared-diffs (inputs are the Spark-computed scaled
    subvectors, so no float fold is re-derived here), and
    ``np.argmin``'s first-minimum rule IS the (d2, cid) lexicographic
    tie-break of ``array_min`` over (d2, cid) structs. Bit-identical
    output, ~50x faster — this is the "Arrow at encode boundaries"
    rule applied to the PQ encode boundary.

    Input: ``base`` with (vec_id, sv0..sv{m-1}) scaled int subvector
    columns. Output: (vec_id, subspace int, code int, dist2 long) —
    the persisted-index code-table schema.
    """
    m = len(cent)

    def gen(batches):
        cents = [np.asarray(c, dtype=np.int64) for c in cent]
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            ids = pdf["vec_id"].to_numpy()
            frames = []
            for s in range(m):
                x = np.stack(pdf[f"sv{s}"].to_numpy()).astype(
                    np.int64, copy=False)
                diff = x[:, None, :] - cents[s][None, :, :]
                d2 = np.einsum("ijk,ijk->ij", diff, diff)
                code = d2.argmin(axis=1)
                frames.append(pd.DataFrame({
                    "vec_id": ids,
                    "subspace": np.full(n, s, dtype=np.int32),
                    "code": code.astype(np.int32),
                    "dist2": d2[np.arange(n), code]}))
            yield pd.concat(frames, ignore_index=True)

    return base.mapInPandas(
        gen, "vec_id long, subspace int, code int, dist2 long")


def _pq_train_update(train: DataFrame, cent: list[list[list[int]]]
                     ) -> list:
    """One Lloyd's update pass for all m subspaces: assign each
    subvector to its nearest centroid (numpy, same integers as the
    Column path — see :func:`_pq_codes_arrow`) and pre-aggregate
    (s, cluster, pos) -> (sum, count) per Arrow batch, so the shuffle
    that merges partials moves at most m * n_cent * sub rows per
    partition regardless of corpus size (map-side combine in the
    UDF). Returns the collected merged rows."""
    m = len(cent)
    n_cent = len(cent[0])
    sub = len(cent[0][0])

    def gen(batches):
        cents = [np.asarray(c, dtype=np.int64) for c in cent]
        for pdf in batches:
            if not len(pdf):
                continue
            rows_s, rows_c, rows_p, rows_sm, rows_n = [], [], [], [], []
            for s in range(m):
                x = np.stack(pdf[f"sv{s}"].to_numpy()).astype(
                    np.int64, copy=False)
                diff = x[:, None, :] - cents[s][None, :, :]
                d2 = np.einsum("ijk,ijk->ij", diff, diff)
                code = d2.argmin(axis=1)
                sums = np.zeros((n_cent, sub), dtype=np.int64)
                np.add.at(sums, code, x)
                counts = np.bincount(code, minlength=n_cent)
                hit = np.flatnonzero(counts)
                for cl in hit:
                    rows_s.extend([s] * sub)
                    rows_c.extend([int(cl)] * sub)
                    rows_p.extend(range(sub))
                    rows_sm.extend(sums[cl].tolist())
                    rows_n.extend([int(counts[cl])] * sub)
            yield pd.DataFrame({"s": rows_s, "cluster": rows_c,
                                "pos": rows_p, "sm": rows_sm,
                                "n": rows_n})

    partials = train.mapInPandas(
        gen, "s int, cluster int, pos int, sm long, n long")
    return (partials.groupBy("s", "cluster", "pos")
            .agg(F.sum("sm").alias("sm"), F.sum("n").alias("n"))
            .collect())


def pq_encode(emb: DataFrame, m: int = 8, n_cent: int = 16,
              iters: int = 2, vec_col: str = "embedding",
              id_col: str = "vec_id", scale: int = 1_000_000,
              dim: int | None = None,
              train_sample: int | None = None
              ) -> tuple[list[list[list[int]]], DataFrame]:
    """Product quantization (Jegou et al., TPAMI'11): split each
    vector into ``m`` contiguous subspaces and vector-quantize each
    with its own :func:`kmeans_fit` codebook — a vector compresses to
    ``m`` small codes (m bytes at k<=256), a 256x memory cut that
    makes billion-vector ANN serving fit in RAM. The IVF sibling
    above prunes WHICH vectors to score; PQ shrinks WHAT is scored.

    Everything inherits k-means' exact integer arithmetic, so codes
    (and ADC distances downstream) are oracle-checkable. Each
    subspace is an independent Lloyd's run over the SAME seeding
    order, but all m runs are trained in ONE shared pass per
    iteration (joint assignment select + one (subspace, cluster,
    pos) aggregation) — iters+2 corpus scans total, not m times
    that.

    Vectors are L2-normalized first (:func:`unit_vec_col`): the ANN
    ground truth here is COSINE, and on unit vectors the ADC L2
    ranking is cosine ranking (||a-b||^2 = 2 - 2cos) — without this
    the compressed index answers a different question than the
    :func:`brute_force_topk` baseline.

    ``train_sample`` bounds CODEBOOK TRAINING to the ``train_sample``
    smallest ids (the deterministic id-ordered rule
    :func:`sources.ann_index.build_ivf_index` already uses for its
    coarse quantizer) while ENCODING still covers the full corpus —
    at 100 TB this cuts the iteration scans from corpus-sized to
    sample-sized with no serving-path change (Jegou et al. train on
    a held-out sample for exactly this reason). ``None`` keeps the
    train-on-everything behavior.

    Returns ``(codebooks, codes)``: ``codebooks[s][j]`` is centroid j
    of subspace s (integer-scaled), codes is (vec_id, subspace, code,
    dist2) with one row per (vector, subspace).
    """
    if dim is None:
        # one tiny probe job; pass ``dim`` explicitly to skip it
        first = emb.select(vec_col).first()
        if first is None or first[0] is None:
            raise ValueError(
                "pq_encode: empty input and no explicit dim")
        dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    import math
    sub = dim // m
    unit = emb.select(F.col(id_col),
                      unit_vec_col(vec_col).alias(vec_col))
    svs = [F.transform(
        F.slice(F.col(vec_col), s * sub + 1, sub),
        lambda x: F.floor(x.cast("double") * float(scale))
        .cast("long")) for s in range(m)]
    base = unit.select(
        F.col(id_col).alias("vec_id"),
        *[svs[s].alias(f"sv{s}") for s in range(m)]).persist()
    try:
        seed_ids = _kmeans_seed_ids(emb, n_cent, id_col)
        seed_rows = {r["vec_id"]: [list(r[f"sv{s}"]) for s in range(m)]
                     for r in base.where(
                         F.col("vec_id").isin(seed_ids)).collect()}
        # cent[s][j] — per-subspace codebooks, trained TOGETHER: all
        # m Lloyd's runs share each pass over the corpus (one
        # assignment select + one (s, cluster, pos) aggregation per
        # iteration) instead of m separate kmeans_fit scans. The
        # arithmetic per subspace is identical to kmeans_fit's, so
        # the codes are unchanged — only the job count drops m-fold.
        cent = [[seed_rows[i][s] for i in seed_ids] for s in range(m)]
        if train_sample is not None:
            # id-ordered bound: "the train_sample smallest ids" == a
            # <= filter against the nth smallest id (ids are unique),
            # so the training restriction is pure codegen, not a join
            bnd = (base.select("vec_id").orderBy("vec_id")
                   .limit(train_sample)
                   .agg(F.max("vec_id")).first()[0])
            train = base.where(F.col("vec_id") <= bnd)
        else:
            train = base

        for _ in range(iters):
            upd = _pq_train_update(train, cent)
            nxt = [[list(c) for c in cs] for cs in cent]
            for r in upd:
                nxt[r["s"]][r["cluster"]][r["pos"]] = math.floor(
                    r["sm"] / r["n"])
            cent = nxt
        codes = _pq_codes_arrow(base, cent)
        return cent, codes
    finally:
        base.unpersist()


def pq_topk(corpus: DataFrame, queries: DataFrame,
            k_results: int = 10, m: int = 8, n_cent: int = 16,
            iters: int = 2, vec_col: str = "embedding",
            id_col: str = "vec_id", scale: int = 1_000_000,
            dim: int | None = None,
            train_sample: int | None = None) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query
    precomputes its m x k lookup table of exact integer distances to
    every codebook centroid, and a corpus vector's approximate
    distance is the SUM of m table lookups — no original vectors are
    touched at scan time.

    Scale shape: the LUT is tiny (n_queries * m * k rows) and
    broadcast; the scan is one map-side hash join of the code table
    against it plus one (qid, vec_id) aggregation — O(N * m) work per
    query batch, with the per-query top-k taken by window over each
    query's scored candidates. Production serving would put IVF in
    front (scan one probe-list, not the corpus); this operator is the
    scoring core, kept separable so the gate can check it exactly.

    Output: (qid, vec_id, adist2, rank) for rank <= k_results,
    tie-broken by vec_id — deterministic, oracle-exact.
    """
    codebooks, codes = pq_encode(corpus, m, n_cent, iters, vec_col,
                                 id_col, scale, dim, train_sample)
    lut = pq_query_lut(queries, codebooks, id_col, vec_col, scale)
    return adc_topk(codes, lut, k_results)


def pq_query_lut(queries: DataFrame, codebooks: list[list[list[int]]],
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 scale: int = 1_000_000) -> DataFrame:
    """Per-query ADC lookup table: (qid, subspace, code, qd2) — the
    exact integer distance of each normalized query subvector to every
    codebook centroid. Tiny (n_queries * m * n_cent rows); broadcast
    it into the code scan."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    unit_q = queries.select(F.col(id_col),
                            unit_vec_col(vec_col).alias(vec_col))
    luts = []
    for s in range(m):
        qsv = F.transform(
            F.slice(F.col(vec_col), s * sub + 1, sub),
            lambda x: F.floor(x.cast("double") * float(scale))
            .cast("long"))
        entries = [F.struct(F.lit(j).alias("code"),
                            _centroid_d2("qs", cent).alias("qd2"))
                   for j, cent in enumerate(codebooks[s])]
        luts.append(
            unit_q.select(F.col(id_col).alias("qid"), qsv.alias("qs"))
            .select("qid", F.lit(s).alias("subspace"),
                    F.explode(F.array(*entries)).alias("e"))
            .select("qid", "subspace", F.col("e.code").alias("code"),
                    F.col("e.qd2").alias("qd2")))
    lut = luts[0]
    for part in luts[1:]:
        lut = lut.unionByName(part)
    return lut


def adc_topk(codes: DataFrame, lut: DataFrame,
             k_results: int = 10) -> DataFrame:
    """ADC scoring core shared by :func:`pq_topk` and the persisted
    index (sources.ann_index.query_pq_index): broadcast-join the
    (vec_id, subspace, code) table against the query LUT, sum the m
    lookups per (query, vector), rank per query."""
    scored = (codes.join(F.broadcast(lut), ["subspace", "code"])
              .groupBy("qid", "vec_id")
              .agg(F.sum("qd2").cast("long").alias("adist2")))
    w = Window.partitionBy("qid").orderBy("adist2", "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k_results))


def ivfpq_topk(corpus: DataFrame, queries: DataFrame,
               k_results: int = 10, n_clusters: int = 16,
               n_probe: int = 4, kmeans_iters: int = 2,
               train_sample: int = 2048, m: int = 8, n_cent: int = 16,
               iters: int = 2, id_col: str = "vec_id",
               vec_col: str = "embedding", scale: int = 1_000_000,
               pq_train_sample: int | None = None) -> DataFrame:
    """The capstone billion-vector layout — IVF x PQ composed: the
    coarse quantizer (:func:`ivf_centroids`) prunes WHICH vectors each
    query scores (``n_probe`` of ``n_clusters`` inverted lists), and
    the PQ codes (:func:`pq_encode`) shrink WHAT scoring a candidate
    costs (m byte-sized table lookups instead of a full-vector dot).
    Per query the scan cost is
    ``O(corpus * n_probe / n_clusters * m)`` lookups — the Faiss
    IVFADC shape, expressed as two broadcast joins and one
    aggregation.

    Both stages reuse their standalone, individually-gated parts, and
    every quantity is the same exact integer/fold arithmetic, so this
    composition is itself hash-gated end-to-end. Self-matches are kept
    (the pure-ADC convention here; drop ``qid = vec_id`` rows for
    recall work — :func:`ann_recall` does).

    Output: (qid, vec_id, adist2, rank), rank <= k_results over the
    PROBED candidates only, ties broken by vec_id.
    """
    train = np.array(
        [r[0] for r in corpus.select(vec_col).orderBy(id_col)
         .limit(train_sample).collect()], dtype=np.float64)
    cent = ivf_centroids(train, n_clusters, kmeans_iters)
    casg = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.element_at(cluster_assign_udf(cent, 1)(F.col(vec_col)), 1)
        .alias("cluster"))
    qasg = queries.select(
        F.col(id_col).alias("qid"),
        F.explode(cluster_assign_udf(cent, n_probe)(F.col(vec_col)))
        .alias("cluster"))
    codebooks, codes = pq_encode(corpus, m, n_cent, iters, vec_col,
                                 id_col, scale,
                                 train_sample=pq_train_sample)
    lut = pq_query_lut(queries, codebooks, id_col, vec_col, scale)
    cand = (casg.join(F.broadcast(qasg), "cluster")
            .select("qid", "vec_id").distinct())
    scored = (codes.join(cand, "vec_id")
              .join(F.broadcast(lut), ["qid", "subspace", "code"])
              .groupBy("qid", "vec_id")
              .agg(F.sum("qd2").cast("long").alias("adist2")))
    w = Window.partitionBy("qid").orderBy("adist2", "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k_results))


def pq_encode_with_books(emb: DataFrame,
                         codebooks: list[list[list[int]]],
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         scale: int = 1_000_000) -> DataFrame:
    """Encode vectors against FIXED codebooks (no training): per
    subspace, the normalized scaled subvector's nearest centroid by
    the same (d2, code) tie-break the k-means assignment uses — so
    encoding a vector later (index upsert) yields the identical code
    it would have received in the original build.

    Output: (vec_id, subspace, code, dist2) — pq_encode's code-table
    shape.
    """
    m = len(codebooks)
    sub = len(codebooks[0][0])
    unit = emb.select(F.col(id_col).alias("vec_id"),
                      unit_vec_col(vec_col).alias("v"))
    svs = [F.transform(
        F.slice(F.col("v"), s * sub + 1, sub),
        lambda x: F.floor(x.cast("double") * float(scale))
        .cast("long")) for s in range(m)]
    base = unit.select("vec_id",
                       *[svs[s].alias(f"sv{s}") for s in range(m)])
    return _pq_codes_arrow(base, codebooks)
