"""Mixture planning / DSIR selection tests: invariants of the
token-budgeted sampler and the cross-model scorer."""

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL

WEIGHTS = {"src0": 0.5, "src1": 0.5}
BUDGET = 1_000
SCALE = 1_000_000


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").cache()


def test_mix_plan_arithmetic(spark, docs):
    from maps_spark.operators.mixture import mix_plan
    rows = {r["source"]: r for r in
            mix_plan(docs, WEIGHTS, BUDGET).collect()}
    # every source in the corpus appears; unweighted ones carry 0s
    srcs = {r["source"] for r in docs.select("source").distinct().collect()}
    assert set(rows) == srcs
    for s, r in rows.items():
        if s not in WEIGHTS:
            assert r["w_scaled"] == 0 and r["rate_scaled"] == 0
        else:
            assert r["target_tokens"] == BUDGET * r["w_scaled"] // SCALE
            expect = min(SCALE,
                         r["target_tokens"] * SCALE // r["n_tokens"])
            assert r["rate_scaled"] == expect
        assert 0 <= r["rate_scaled"] <= SCALE


def test_mix_plan_small_source_kept_whole(spark, docs):
    # a huge budget drives every weighted source to rate 1.0 (never >)
    from maps_spark.operators.mixture import mix_plan
    rows = mix_plan(docs, WEIGHTS, 10_000_000).where(
        F.col("w_scaled") > 0).collect()
    assert rows and all(r["rate_scaled"] == SCALE for r in rows)


def test_mix_sample_deterministic_and_bounded(spark, docs):
    from maps_spark.operators.mixture import mix_plan, mix_sample
    s1 = sorted(r["doc_id"] for r in
                mix_sample(docs, WEIGHTS, BUDGET).collect())
    s2 = sorted(r["doc_id"] for r in
                mix_sample(docs, WEIGHTS, BUDGET).collect())
    assert s1 == s2 and len(s1) > 0
    # only weighted sources contribute, and token mass lands near the
    # per-source allocation (hash sampling is uniform-ish; wide bound)
    samp = mix_sample(docs, WEIGHTS, BUDGET)
    per = {r["source"]: r["toks"] for r in
           samp.groupBy("source").agg(
               F.sum("n_tokens").alias("toks")).collect()}
    plan = {r["source"]: r for r in
            mix_plan(docs, WEIGHTS, BUDGET).collect()}
    assert set(per) <= set(WEIGHTS)
    for s, toks in per.items():
        assert toks <= 4 * plan[s]["target_tokens"]


def test_lm_crossentropy_self_model_matches_lm_score(spark, docs):
    from maps_spark.operators.corpus import lm_score
    from maps_spark.operators.mixture import lm_crossentropy
    a = {r["doc_id"]: (r["n_bigrams"], r["nll_scaled"])
         for r in lm_score(docs).collect()}
    b = {r["doc_id"]: (r["n_bigrams"], r["nll_scaled"])
         for r in lm_crossentropy(docs, docs).collect()}
    assert a == b


def test_lm_crossentropy_unseen_backoff(spark):
    # a doc whose bigrams the model never saw costs -ln(1/(0 + V)) per
    # bigram: model vocab {a,b} => V=2, lp = floor(1e6*ln(1/2))
    import math
    from maps_spark.operators.mixture import lm_crossentropy
    model = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    doc = spark.createDataFrame([(2, "x y z")], "doc_id long, text string")
    [r] = lm_crossentropy(doc, model).collect()
    lp = math.floor(1e6 * math.log(1 / 2))
    assert r["n_bigrams"] == 2
    assert r["nll_scaled"] == -2 * lp


def test_dsir_target_docs_rank_high(spark, docs):
    # documents of the target language must dominate the top of the
    # importance ranking (that is the whole point of DSIR)
    from maps_spark.operators.mixture import dsir_select
    target = docs.where("lang = 'en'")
    top = dsir_select(docs, target, 30)
    langs = (top.join(docs.select("doc_id", "lang"), "doc_id")
             .groupBy("lang").count().collect())
    counts = {r["lang"]: r["count"] for r in langs}
    assert counts.get("en", 0) >= 20


def test_dsir_select_rank_is_dense_and_ordered(spark, docs):
    from maps_spark.operators.mixture import dsir_select
    rows = (dsir_select(docs, docs.where("lang = 'en'"), 25)
            .orderBy("sel_rank").collect())
    assert [r["sel_rank"] for r in rows] == list(range(1, 26))
    imps = [r["importance_scaled"] for r in rows]
    assert imps == sorted(imps, reverse=True)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()


def test_semantic_dedup_verdict_invariants(spark, emb):
    from maps_spark.operators.similarity import semantic_dedup
    rows = semantic_dedup(emb, threshold=0.3).collect()
    assert len(rows) == emb.count()  # one verdict per vector
    cluster = {r["vec_id"]: r["cluster"] for r in rows}
    for r in rows:
        assert r["is_dup"] == (r["dup_of"] is not None)
        if r["is_dup"]:
            # the canonical mate is lower-id and in the same cluster
            assert r["dup_of"] < r["vec_id"]
            assert cluster[r["dup_of"]] == r["cluster"]


def test_semantic_dedup_synthetic_twins(spark):
    from maps_spark.operators.similarity import semantic_dedup
    import numpy as np
    rng = np.random.RandomState(7)
    base = rng.randn(40, 8).astype("float32")
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    rows.append((40, rows[3][1]))  # exact twin of vec 3
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(df, threshold=0.999, n_clusters=4,
                          train_sample=41).collect()}
    assert out[40]["is_dup"] and out[40]["dup_of"] == 3
    assert not out[3]["is_dup"]


def test_shard_assign_balanced_and_total(spark, docs):
    from maps_spark.operators.packing import shard_assign
    asg = shard_assign(docs, n_shards=8)
    n = docs.count()
    sizes = {r["shard"]: r["count"] for r in
             asg.groupBy("shard").count().collect()}
    assert sum(sizes.values()) == n
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # row_idx is a permutation of 0..n-1
    idx = sorted(r["row_idx"] for r in asg.select("row_idx").collect())
    assert idx == list(range(n))


def test_write_training_shards_roundtrip(spark, docs, tmp_path):
    import os
    from maps_spark.operators.packing import shard_assign, \
        write_training_shards
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)
    assert sorted(d for d in os.listdir(out) if d.startswith("shard=")) \
        == [f"shard={k}" for k in range(4)]
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(back.columns) >= set(docs.columns) | {"row_idx", "shard"}
    # shard 0's file order IS the global shuffle order restricted to it
    asg = shard_assign(docs, n_shards=4)
    want = [r["doc_id"] for r in asg.where("shard = 0")
            .orderBy("row_idx").collect()]
    import pyarrow.parquet as pq
    got = []
    d0 = os.path.join(out, "shard=0")
    for f in sorted(os.listdir(d0)):
        if f.endswith(".parquet"):
            got += pq.read_table(os.path.join(d0, f),
                                 columns=["doc_id"])["doc_id"].to_pylist()
    assert got == want


def test_upsert_ivf_index_incremental(spark, emb, tmp_path):
    import pyspark.sql.functions as F
    from maps_spark.operators.similarity import cluster_assign_udf
    from maps_spark.sources.ann_index import (build_ivf_index,
                                              load_centroids,
                                              query_ivf_index,
                                              upsert_ivf_index)
    root = str(tmp_path / "ivf")
    old = emb.where("vec_id < 400")
    new = emb.where("vec_id >= 400")
    build_ivf_index(old, root, n_clusters=8, train_sample=400)
    r = upsert_ivf_index(new, root)
    assert r["appended"] == new.count() and r["skipped_existing"] == 0
    # replay is a no-op (idempotent)
    r2 = upsert_ivf_index(new, root)
    assert r2["appended"] == 0
    assert r2["skipped_existing"] == new.count()
    # appended rows live in the cluster the STORED centroids assign
    cent = load_centroids(spark, root)
    stored = (spark.read.parquet(f"{root}/vectors")
              .where("vec_id >= 400"))
    want = {r["vec_id"]: r["c"] for r in new.select(
        "vec_id", F.element_at(
            cluster_assign_udf(cent, 1)(F.col("embedding")), 1)
        .alias("c")).collect()}
    for row in stored.collect():
        assert row["cluster"] == want[row["vec_id"]]
    # and the upserted vectors are reachable through the query path
    hits = query_ivf_index(spark, root, new.limit(4), k=5)
    assert hits.where("neighbor_id >= 400").count() > 0


def test_degenerate_inputs_do_not_crash(spark, docs):
    import pyspark.sql.functions as F
    from maps_spark.operators.mixture import (dsir_importance,
                                              lm_crossentropy, mix_sample)
    # empty weight map -> every source rate 0 -> empty sample, no error
    assert mix_sample(docs, {}, 1000).count() == 0
    # empty model corpus -> V clamps to 1, unseen bigrams cost ln(1)=0
    empty = docs.where(F.lit(False))
    one = docs.limit(1)
    [r] = lm_crossentropy(one, empty).collect()
    assert r["nll_scaled"] == 0
    # empty target in the fused DSIR path behaves the same way
    rows = dsir_importance(one, empty).collect()
    assert rows and rows[0]["nll_target_scaled"] == 0


def test_quality_tiers_balanced_and_ordered(spark, docs):
    import pyspark.sql.functions as F
    from maps_spark.operators.corpus import lm_score
    from maps_spark.operators.mixture import quality_tiers
    tiers = quality_tiers(lm_score(docs), "avg_nll_scaled", n_tiers=4)
    rows = tiers.collect()
    n = len(rows)
    sizes = {}
    for r in rows:
        sizes[r["tier"]] = sizes.get(r["tier"], 0) + 1
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # ranks are a permutation and tiers respect score order
    assert sorted(r["rank"] for r in rows) == list(range(n))
    by_rank = sorted(rows, key=lambda r: r["rank"])
    scores = [r["score"] for r in by_rank]
    assert scores == sorted(scores)
    tiers_seq = [r["tier"] for r in by_rank]
    assert tiers_seq == sorted(tiers_seq)
    # descending mode flips tier 0 to the highest scores
    from maps_spark.operators.mixture import quality_tiers as qt
    desc = qt(lm_score(docs), "avg_nll_scaled", n_tiers=4,
              ascending=False)
    top0 = desc.where("tier = 0").agg(F.min("score")).first()[0]
    bot3 = desc.where("tier = 3").agg(F.max("score")).first()[0]
    assert top0 >= bot3


def test_weighted_sample_downweights_clusters(spark):
    """Expected-mass semantics at rate 1.0: weight scale/4 keeps ~1/4
    of a big planted duplicate cluster; full-weight docs all stay.
    Deterministic: two runs identical."""
    import pyspark.sql.functions as F
    from maps_spark.operators.mixture import weighted_sample
    n = 400
    rows = [(i, 4 if i < 200 else 1) for i in range(n)]
    w = spark.createDataFrame(rows, "doc_id long, cluster_size long") \
        .select("doc_id", "cluster_size",
                F.expr("1000000 div cluster_size").cast("long")
                .alias("weight_scaled"))
    kept = weighted_sample(w, rate=1.0).collect()
    kept_ids = {r.doc_id for r in kept}
    assert all(i in kept_ids for i in range(200, 400))  # full weight
    quarter = sum(1 for i in range(200) if i in kept_ids)
    assert 20 <= quarter <= 80  # ~50 expected of 200 at p=1/4
    again = {r.doc_id for r in weighted_sample(w, rate=1.0).collect()}
    assert kept_ids == again


def test_negative_samples_contracts(spark):
    """Contrastive negative sampling: never the anchor, never a
    positive of that anchor, at most k per anchor with contiguous
    ranks, fully deterministic across runs, and probe-bounded (the
    plan joins anchors x probes against buckets — no cross join)."""
    import pyspark.sql.functions as F

    from maps_spark.operators.mixture import negative_samples
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)],
        "doc_id long, source string")
    pos = spark.createDataFrame(
        [(i, (i + 1) % 60) for i in range(60)]
        + [(i, (i + 2) % 60) for i in range(60)],
        "doc_a long, doc_b long")
    out = negative_samples(pos, docs, k=3, oversample=5)
    rows = out.collect()
    positives = {(i, (i + 1) % 60) for i in range(60)} \
        | {(i, (i + 2) % 60) for i in range(60)}
    per = {}
    for r in rows:
        assert r.negative != r.anchor
        assert (r.anchor, r.negative) not in positives
        per.setdefault(r.anchor, []).append(r.rank)
    assert set(per) == set(range(60))
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # deterministic: a second evaluation returns the identical set
    again = {(r.anchor, r.negative, r.rank)
             for r in negative_samples(pos, docs, k=3,
                                       oversample=5).collect()}
    assert again == {(r.anchor, r.negative, r.rank) for r in rows}
    # scale shape: no CartesianProduct / BroadcastNestedLoop anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_group_sample_exact_with_and_without_rescue(spark):
    """group_sample must equal the naive per-group window for EVERY
    margin — margin=1 under-admits some groups, forcing the rescue
    pass, and the result must still be the true k smallest."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from maps_spark.operators.corpus import P31, _mix, group_sample
    docs = spark.createDataFrame(
        [(i, f"s{i % 5}") for i in range(200)],
        "doc_id long, source string")
    w = Window.partitionBy("source").orderBy(
        _mix(F.col("doc_id") % P31), "doc_id")
    naive = {tuple(r) for r in docs
             .withColumn("r", F.row_number().over(w))
             .where("r <= 9")
             .select("source", "doc_id",
                     F.col("r").cast("int").alias("sample_rank"))
             .collect()}
    for margin in (32, 1):
        got = {tuple(r) for r in
               group_sample(docs, ["source"], k=9, id_col="doc_id",
                            margin=margin).collect()}
        assert got == naive, margin
    # k larger than the group returns the whole group, ranked
    small = spark.createDataFrame([(1, "a"), (2, "a")],
                                  "doc_id long, source string")
    rows = group_sample(small, ["source"], k=10).collect()
    assert len(rows) == 2
    assert sorted(r.sample_rank for r in rows) == [1, 2]
