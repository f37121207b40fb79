"""Training-data operator tests: recall/consistency of the approximate
methods against exact ground truth, plus plumbing checks."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()


def test_text_features_match_python(spark, docs):
    from maps_spark.operators.text import text_features
    rows = {r.doc_id: r for r in text_features(docs).collect()}
    for r in docs.limit(20).collect():
        got = rows[r.doc_id]
        assert got.n_chars == len(r.text)
        assert got.n_tokens == r.text.count(" ") + 1
        assert got.n_tokens == len(r.text.split(" "))


def test_lang_id_on_planted_samples(spark):
    # the synthetic corpus reuses one vocabulary for every lang label, so
    # accuracy is tested on planted texts with real language signal
    from maps_spark.operators.text import lang_id
    samples = [
        (1, "the cat and the dog sat on the mat of the house", "en"),
        (2, "el perro y la casa que el gato vio en la calle", "es"),
        (3, "le chien et le chat et les maisons dans le jardin", "fr"),
        (4, "der hund und die katze und der garten und die strasse", "de"),
        (5, "我的猫是很好的动物它喜欢了睡觉和吃饭的时候", "zh"),
    ]
    df = spark.createDataFrame(samples, "doc_id long, text string, lang string")
    pred = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    for doc_id, _, lang in samples:
        assert pred[doc_id] == lang, (doc_id, pred[doc_id], lang)


def test_fingerprint_deterministic(spark, docs):
    from maps_spark.operators.text import fingerprint
    a = {r.doc_id: r.fingerprint for r in fingerprint(docs).collect()}
    b = {r.doc_id: r.fingerprint for r in fingerprint(docs).collect()}
    assert a == b
    # distinct texts should essentially never collide
    texts = docs.select("doc_id", "text").collect()
    distinct_texts = len({r.text for r in texts})
    assert len(set(a.values())) == distinct_texts


def test_minhash_estimates_jaccard(spark, docs):
    from maps_spark.operators.dedup import (minhash_lsh_pairs,
                                            minhash_signatures,
                                            minhash_verify,
                                            ngram_jaccard_pairs)
    exact = {(r.doc_a, r.doc_b): r.jaccard_scaled / 1e6
             for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    sigs = minhash_signatures(docs)
    pairs = minhash_lsh_pairs(docs, bands=32)  # aggressive banding
    est = {(r.doc_a, r.doc_b): r.jaccard_est
           for r in minhash_verify(pairs, sigs, threshold=0.0).collect()}
    strong = {p for p, j in exact.items() if j >= 0.5}
    if strong:
        found = sum(p in est for p in strong)
        assert found / len(strong) >= 0.8  # LSH recall on strong pairs
    for p, j in exact.items():
        if p in est:
            assert abs(est[p] - j) < 0.35  # signature estimate sanity


def test_jaccard_prefix_equals_all_pairs(spark, docs):
    # prefix filtering is LOSSLESS: the pruned plan must reproduce the
    # brute-force all-pairs result exactly (ngram_jaccard_pairs with an
    # effectively-infinite df cap IS that brute force)
    from maps_spark.operators.dedup import (jaccard_prefix_pairs,
                                            ngram_jaccard_pairs)
    brute = {(r.doc_a, r.doc_b): (r.inter, r.uni, r.jaccard_scaled)
             for r in ngram_jaccard_pairs(
                 docs, threshold=0.2, max_df=10**9).collect()}
    pruned = {(r.doc_a, r.doc_b): (r.inter, r.uni, r.jaccard_scaled)
              for r in jaccard_prefix_pairs(
                  docs, threshold=0.2).collect()}
    assert pruned == brute
    assert brute  # the corpus must actually produce pairs at 0.2


def test_jaccard_prefix_planted_boilerplate_pair(spark):
    # a pair whose ONLY overlap is a boilerplate shingle shared by the
    # whole corpus: the df-capped variant drops it by design; the
    # prefix-filtered variant must keep it (lossless)
    from maps_spark.operators.dedup import (jaccard_prefix_pairs,
                                            ngram_jaccard_pairs)
    boiler = "all rights reserved to the original publisher site"
    rows = [(i, f"alpha{i} beta{i} gamma{i} {boiler}")
            for i in range(40)]
    # the planted pair's true Jaccard is 0.9, but most of that overlap
    # IS the boilerplate: with the hot shingles df-capped away it
    # drops to 0.75 and vanishes below the 0.8 threshold
    rows.append((100, f"promo sale today {boiler}"))
    rows.append((101, f"promo sale today {boiler} extra"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pruned = {(r.doc_a, r.doc_b): r.jaccard_scaled
              for r in jaccard_prefix_pairs(docs, threshold=0.8)
              .collect()}
    assert pruned == {(100, 101): 900_000}
    capped = ngram_jaccard_pairs(docs, threshold=0.8, max_df=10).count()
    assert capped == 0  # the df cap loses the boilerplate-heavy pair


def test_simhash_identical_docs_collide(spark, docs):
    from maps_spark.operators.dedup import simhash
    two = docs.limit(1)
    dup = two.union(two.withColumn("doc_id", F.col("doc_id") + 100000))
    hashes = [r.simhash for r in simhash(dup).collect()]
    assert hashes[0] == hashes[1]


def test_ann_lsh_recall(spark, emb):
    from maps_spark.operators.similarity import brute_force_topk, lsh_topk
    queries = emb.where(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, k=5, n_bits=6, n_tables=8).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # near-orthogonal random vectors are the worst case for sign-LSH;
    # multi-table probing should still recover a fair share
    assert recall >= 0.3, f"LSH recall {recall}"


def test_ann_scores_match_numpy(spark, emb):
    from maps_spark.operators.similarity import brute_force_topk
    got = brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=3).collect()
    rows = emb.orderBy("vec_id").collect()
    m = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
    q = m[0]
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    cos[0] = -np.inf
    top = np.argsort(-cos)[:3]
    assert [r.neighbor_id for r in sorted(got, key=lambda r: r.rank)] == \
        [rows[i].vec_id for i in top]


def test_multimodal_plumbing(spark):
    from maps_spark.operators.multimodal import (extract_features,
                                                 frame_sample,
                                                 synthesize_media)
    media = synthesize_media(spark, n=30)
    feats = extract_features(media, feat_dim=16).collect()
    assert len(feats) == 30
    assert all(len(r.feat) == 16 for r in feats)
    assert all(r.decode_ok for r in feats)
    frames = frame_sample(media, every_n=100).collect()
    vids = [r for r in media.collect() if r.kind == "video"]
    assert len(frames) == sum((v.n_frames + 99) // 100 for v in vids)


def test_exact_dedup_finds_planted_dupes(spark, docs):
    from maps_spark.operators.dedup import exact_duplicates
    planted = docs.limit(3)
    with_dupes = docs.union(
        planted.withColumn("doc_id", F.col("doc_id") + 100000))
    dupes = exact_duplicates(with_dupes).collect()
    assert len(dupes) == 3
    assert all(r.n_dupes == 2 for r in dupes)


def test_lsh_cap_drops_hot_bucket_but_keeps_planted_dups(spark, docs):
    """The cap_buckets skew guard under an adversarial hot bucket
    (VERDICT r9 #6): 30% of docs replaced by one byte-identical
    boilerplate text — every band maps them to ONE bucket, far over
    the cap — while three planted near-dup pairs live OUTSIDE the hot
    bucket. The cap must drop the boilerplate bucket's quadratic join
    (no boilerplate-boilerplate pair in the output) and must NOT cost
    the planted pairs their recall."""
    from maps_spark.operators.dedup import minhash_lsh_pairs
    boiler = " ".join(f"boiler{j % 97}tok" for j in range(60))
    base = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < 3, F.lit(boiler))
        .otherwise(F.col("text")).alias("text"))
    # planted true dups: byte-identical copies of three NON-boilerplate
    # docs under fresh ids (identical text => identical signature =>
    # same bucket in every band)
    planted = (base.where("doc_id % 10 >= 3")
               .orderBy("doc_id").limit(3)
               .withColumn("doc_id", F.col("doc_id") + 100000))
    corpus = base.unionByName(planted).localCheckpoint()
    n_boiler = corpus.where(F.col("text") == boiler).count()
    cap = max(10, n_boiler // 3)  # hot bucket decisively over the cap
    pairs = {(r.doc_a, r.doc_b) for r in
             minhash_lsh_pairs(corpus, max_bucket=cap).collect()}
    boiler_ids = {r.doc_id for r in
                  corpus.where(F.col("text") == boiler).collect()}
    assert not any(a in boiler_ids and b in boiler_ids
                   for a, b in pairs), "hot bucket joined despite cap"
    for r in planted.collect():
        orig = r.doc_id - 100000
        assert (orig, r.doc_id) in pairs or (r.doc_id, orig) in pairs, \
            f"planted dup {orig} lost to the cap"


def test_ann_ivf_recall(spark, emb):
    from maps_spark.operators.similarity import brute_force_topk, ivf_topk
    queries = emb.where(F.col("vec_id") < 8)
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = ivf_topk(emb, queries, k=10, n_clusters=16, n_probe=8).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # weak cluster structure on near-orthogonal vectors; half the
    # centroids probed must still recover most true neighbours
    assert recall >= 0.5, f"IVF recall {recall}"
    # probing more clusters must never reduce the candidate set quality
    approx4 = ivf_topk(emb, queries, k=10, n_clusters=16,
                       n_probe=4).collect()
    recall4 = len(exact_set & {(r.query_id, r.neighbor_id)
                               for r in approx4}) / len(exact_set)
    assert recall >= recall4


def test_ann_recall_operator_counts(spark, emb):
    """ann_recall's integer counts must equal the set-intersection
    computed independently from the two top-k results, and IVF
    recall@10 with n_probe=8 must clear the same bound the raw test
    above asserts."""
    from maps_spark.operators.similarity import (ann_recall,
                                                 brute_force_topk,
                                                 ivf_topk)
    queries = emb.where(F.col("vec_id") < 8)
    got = {r.query_id: (r.n_exact, r.n_hits)
           for r in ann_recall(emb, queries, k=10, method="ivf",
                               n_clusters=16, n_probe=8).collect()}
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = ivf_topk(emb, queries, k=10, n_clusters=16,
                      n_probe=8).collect()
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    for qid in {r.query_id for r in exact}:
        e_rows = {(r.query_id, r.neighbor_id)
                  for r in exact if r.query_id == qid}
        assert got[qid] == (len(e_rows), len(e_rows & approx_set))
    total_exact = sum(v[0] for v in got.values())
    total_hits = sum(v[1] for v in got.values())
    assert total_hits / total_exact >= 0.5
    with pytest.raises(ValueError):
        ann_recall(emb, queries, method="bogus")


class TestHotBucketGuards:
    """Plant a boilerplate hot bucket and assert the candidate
    generators stay bounded (the 100 TB quadratic-blowup guards)."""

    def _hot_docs(self, spark):
        # 40 identical boilerplate docs + one genuine near-dup pair
        # (same token bag, different order: identical simhash, high
        # shingle overlap — survives every generator deterministically)
        boiler = "the quick brown fox jumps over the lazy dog again and again"
        toks = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa mu nu xi omicron rho sigma tau upsilon").split()
        near_a = " ".join(toks)
        near_b = " ".join(toks[:-2] + toks[-1:] + toks[-2:-1])
        rows = [(i, boiler) for i in range(40)]
        rows += [(100, near_a), (101, near_b)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_simhash_hot_bucket_capped(self, spark):
        from maps_spark.operators.dedup import simhash_near_pairs
        docs = self._hot_docs(spark)
        pairs = simhash_near_pairs(docs, max_bucket=10).collect()
        ids = {(p.doc_a, p.doc_b) for p in pairs}
        # the 40-doc boilerplate bucket (780 pairs) must be dropped
        assert all(a >= 100 for a, _ in ids), ids
        # the genuine near-dup pair survives (its buckets have size 2)
        assert (100, 101) in ids

    def test_ngram_hot_shingle_capped(self, spark):
        from maps_spark.operators.dedup import ngram_jaccard_pairs
        docs = self._hot_docs(spark)
        pairs = ngram_jaccard_pairs(docs, threshold=0.5,
                                    max_df=10).collect()
        ids = {(p.doc_a, p.doc_b) for p in pairs}
        # boilerplate shingles (df=40 > 10) excluded -> boilerplate
        # docs have no shingles left, no pairs among them
        assert all(a >= 100 for a, _ in ids), ids
        assert (100, 101) in ids

    def test_minhash_half_corpus_identical_capped(self, spark):
        """Adversarial 50% skew: half the corpus is ONE boilerplate
        text. The banded-LSH candidate generator must drop that
        bucket (100 > max_bucket) instead of emitting ~100^2/2 pairs,
        while a genuine near-dup pair in the healthy half survives."""
        from maps_spark.operators.dedup import minhash_lsh_pairs
        boiler = ("lorem ipsum dolor sit amet consectetur adipiscing "
                  "elit sed do eiusmod tempor incididunt ut labore")
        toks = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa mu nu xi omicron rho sigma tau upsilon").split()
        rows = [(i, boiler) for i in range(100)]
        rows += [(1000 + i, " ".join(f"w{(i * 31 + j * 7) % 9973}"
                                     for j in range(12)))
                 for i in range(98)]
        rows += [(5000, " ".join(toks)),
                 (5001, " ".join(toks[:-2] + toks[-1:] + toks[-2:-1]))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = minhash_lsh_pairs(docs, max_bucket=10).collect()
        ids = {(p.doc_a, p.doc_b) for p in pairs}
        assert all(a >= 1000 for a, _ in ids), sorted(ids)[:5]
        assert (5000, 5001) in ids
        # bounded output: never within two orders of the 4950
        # boilerplate pairs a capless generator would emit
        assert len(ids) < 500

    def test_domain_cap_under_half_corpus_skew(self, spark):
        """50% of docs in one megadomain: domain_cap keeps exactly
        ``cap`` of it (lowest doc_id), passes under-cap domains
        through untouched."""
        from maps_spark.operators.corpus import domain_cap
        rows = [(i, "hot.example", f"t{i}") for i in range(100)]
        rows += [(1000 + i, f"d{i % 20}.example", f"t{i}")
                 for i in range(100)]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        out = domain_cap(docs, cap=5).collect()
        by_dom = {}
        for r in out:
            by_dom.setdefault(r.source, []).append(r.doc_id)
        assert sorted(by_dom["hot.example"]) == [0, 1, 2, 3, 4]
        for d, ids in by_dom.items():
            if d != "hot.example":
                assert len(ids) == 5  # 20 domains x 5 docs, all kept

    def test_embedding_hot_bucket_capped(self, spark):
        import numpy as np
        from maps_spark.operators.similarity import embedding_near_dupes
        rng = np.random.default_rng(3)
        hot = rng.standard_normal(64)
        near = rng.standard_normal(64)
        rows = [(i, (hot + 1e-6 * rng.standard_normal(64)).tolist())
                for i in range(40)]
        rows += [(100, near.tolist()),
                 (101, (near + 1e-3 * rng.standard_normal(64)).tolist())]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = embedding_near_dupes(emb, threshold=0.99,
                                     max_bucket=10).collect()
        ids = {(p.doc_a, p.doc_b) for p in pairs}
        assert all(a >= 100 for a, _ in ids), ids
        assert (100, 101) in ids


class TestCorpusOps:
    def test_dedup_clusters_on_planted_graph(self, spark):
        # chain 1-2-3 + pair (10,11) + isolated doc 99 (no pairs)
        from maps_spark.operators.dedup import dedup_clusters
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
        out = {r.doc_id: r for r in dedup_clusters(pairs).collect()}
        assert set(out) == {1, 2, 3, 10, 11}
        assert all(out[d].cluster_id == 1 and out[d].cluster_size == 3
                   for d in (1, 2, 3))
        assert all(out[d].cluster_id == 10 and out[d].cluster_size == 2
                   for d in (10, 11))
        assert {d for d, r in out.items() if r.keep} == {1, 10}

    def test_dedup_clusters_long_chain_converges(self, spark):
        from maps_spark.operators.dedup import dedup_clusters
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "doc_a long, doc_b long")
        out = dedup_clusters(pairs).collect()
        assert len(out) == 13
        assert all(r.cluster_id == 0 and r.cluster_size == 13 for r in out)

    def test_dedup_clusters_adversarial_chain_star(self, spark):
        # a 400-node chain has diameter 400: plain min-label would need
        # 400 rounds; large-star/small-star must close it in O(log n)
        # rounds and still find the exact component
        from maps_spark.operators.dedup import dedup_clusters
        n = 400
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "doc_a long, doc_b long")
        out = dedup_clusters(pairs, max_iters=15, method="star").collect()
        assert len(out) == n + 1
        assert all(r.cluster_id == 0 and r.cluster_size == n + 1
                   for r in out)
        assert sum(1 for r in out if r.keep) == 1

    def test_dedup_clusters_methods_agree(self, spark):
        # star and label propagation compute identical clusters on a
        # mixed graph (cliques + chains + pairs, shuffled ids)
        from maps_spark.operators.dedup import dedup_clusters
        edges = ([(7, 3), (3, 9), (9, 7)] +            # clique
                 [(20, 15), (15, 28), (28, 22)] +      # chain
                 [(101, 100)] +                        # pair
                 [(55, 55)])                           # self-loop noise
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        star = {(r.doc_id, r.cluster_id, r.cluster_size, r.keep)
                for r in dedup_clusters(pairs, method="star").collect()}
        label = {(r.doc_id, r.cluster_id, r.cluster_size, r.keep)
                 for r in dedup_clusters(pairs, method="label").collect()}
        # the self-loop node forms no pair edge in star mode; label
        # mode sees it as its own singleton — align on shared docs
        star_docs = {d for d, *_ in star}
        label = {t for t in label if t[0] in star_docs}
        star = {t for t in star if t[0] != 55}
        assert star == label
        # the bounded driver union-find (method="auto" on small graphs)
        # must agree with star exactly, self-loop semantics included
        driver = {(r.doc_id, r.cluster_id, r.cluster_size, r.keep)
                  for r in dedup_clusters(pairs, method="driver").collect()}
        assert driver == star

    def test_contamination_flags_benchmark_copy(self, spark):
        from maps_spark.operators.corpus import contamination_check
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string")
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta"),   # full copy
             (2, "alpha beta gamma unrelated words here"),  # partial
             (3, "nothing shared with that suite at all")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in
               contamination_check(docs, bench).collect()}
        assert out[1].contamination_scaled == 1_000_000 and out[1].flagged
        assert 0 < out[2].contamination_scaled < 1_000_000
        assert out[3].n_contaminated == 0 and not out[3].flagged

    def test_stratified_sample_deterministic_and_sized(self, spark, docs):
        from maps_spark.operators.corpus import stratified_sample
        a = sorted(map(tuple, stratified_sample(docs, "lang", 20).collect()))
        b = sorted(map(tuple, stratified_sample(docs, "lang", 20).collect()))
        assert a == b and len(a) == 100  # 5 langs x 20
        per = {}
        for _, lang, rank in a:
            per.setdefault(lang, []).append(rank)
        assert all(sorted(v) == list(range(1, 21)) for v in per.values())

    def test_hash_sample_rate_and_split_disjointness(self, spark, docs):
        from maps_spark.operators.corpus import P31, _mix, hash_sample
        import pyspark.sql.functions as F
        n = docs.count()
        train = hash_sample(docs, 0.8)
        val = docs.where(_mix(F.col("doc_id")) >= int(0.8 * P31))
        nt, nv = train.count(), val.count()
        assert nt + nv == n
        assert abs(nt / n - 0.8) < 0.1  # deterministic hash ~ uniform
        ids = {r.doc_id for r in train.select("doc_id").collect()}
        assert not ids & {r.doc_id for r in val.select("doc_id").collect()}


class TestRepetitionAndTfidf:
    def test_repetition_signals_planted(self, spark):
        from maps_spark.operators.text import repetition_signals
        docs = spark.createDataFrame(
            [(1, "a a a b"), (2, "x y"), (3, "w")],
            "doc_id long, text string")
        rows = {r.doc_id: r for r in repetition_signals(docs).collect()}
        r1 = rows[1]
        assert (r1.n_words, r1.n_distinct_words, r1.max_word_run) == (4, 2, 3)
        assert r1.dup_word_frac_scaled == 2 * 1_000_000 // 4
        assert r1.top_word_frac_scaled == 3 * 1_000_000 // 4
        # bigrams: "a a" x2, "a b" x1 -> top fraction 2/3
        assert r1.top_bigram_frac_scaled == 2 * 1_000_000 // 3
        r2 = rows[2]
        assert (r2.n_words, r2.dup_word_frac_scaled, r2.max_word_run) == \
            (2, 0, 1)
        # single-word doc: no bigrams -> 0, not null
        assert rows[3].top_bigram_frac_scaled == 0

    def test_repetition_matches_python(self, spark, docs):
        from maps_spark.operators.text import repetition_signals
        got = {r.doc_id: r for r in repetition_signals(docs).collect()}
        for r in docs.limit(20).collect():
            toks = [w for w in r.text.split(" ") if w]
            g = got[r.doc_id]
            assert g.n_words == len(toks)
            assert g.n_distinct_words == len(set(toks))
            run = best = 1
            for a, b in zip(toks, toks[1:]):
                run = run + 1 if a == b else 1
                best = max(best, run)
            assert g.max_word_run == best

    def test_tfidf_rare_term_ranks_first(self, spark):
        from maps_spark.operators.text import tf_idf
        docs = spark.createDataFrame(
            [(i, "common words here zebra" if i == 0 else "common words here")
             for i in range(10)], "doc_id long, text string")
        top = {r.rank: r for r in
               tf_idf(docs, top_k=2).where(F.col("doc_id") == 0).collect()}
        assert top[1].word == "zebra"           # df=1 -> highest idf
        assert top[1].df == 1 and top[1].tf == 1
        assert top[2].tfidf_scaled == 0         # df=10=N -> ln(1)=0

    def test_top_ngrams_planted(self, spark):
        from maps_spark.operators.corpus import top_ngrams
        docs = spark.createDataFrame(
            [(1, "p q p q p"), (2, "p q z")], "doc_id long, text string")
        rows = top_ngrams(docs, n=2, k=3).collect()
        assert rows[0].ngram == "p q" and rows[0].n_occ == 3 \
            and rows[0].n_docs == 2
        # trigram form counts the doc-final window correctly
        tri = top_ngrams(docs, n=3, k=2).collect()
        assert tri[0].ngram == "p q p" and tri[0].n_occ == 2

    def test_build_vocab_ids_follow_frequency(self, spark):
        from maps_spark.operators.corpus import build_vocab
        docs = spark.createDataFrame(
            [(1, "b a b c b"), (2, "a b")], "doc_id long, text string")
        rows = {r.word: r for r in build_vocab(docs).collect()}
        assert rows["b"].token_id == 0 and rows["b"].n_occ == 4
        assert rows["a"].token_id == 1 and rows["a"].n_docs == 2
        assert rows["c"].token_id == 2
        assert build_vocab(docs, min_count=2).count() == 2

    def test_pii_scrub_planted(self, spark):
        from maps_spark.operators.text import pii_scrub
        docs = spark.createDataFrame(
            [(1, "mail a.b@x.co or c@y.org ip 10.0.0.1 tel +1 555-123-4567"),
             (2, "nothing sensitive here")],
            "doc_id long, text string")
        rows = {r.doc_id: r for r in pii_scrub(docs).collect()}
        r1 = rows[1]
        assert (r1.n_email, r1.n_ipv4, r1.n_phone) == (2, 1, 1)
        assert "<EMAIL>" in r1.scrubbed and "<IPV4>" in r1.scrubbed
        assert "@" not in r1.scrubbed and "555" not in r1.scrubbed
        assert rows[2].scrubbed == "nothing sensitive here"
        assert rows[2].n_email == 0


class TestAnnIndex:
    """Persisted IVF index: build/query parity and pruning."""

    def test_stored_index_matches_on_the_fly_ivf(self, spark, emb, tmp_path):
        from maps_spark.operators.similarity import ivf_topk
        from maps_spark.sources.ann_index import (build_ivf_index,
                                                  query_ivf_index)
        root = str(tmp_path / "ivf")
        build_ivf_index(emb, root, n_clusters=8, kmeans_iters=2)
        queries = emb.where(F.col("vec_id") < 8)
        got = query_ivf_index(spark, root, queries, k=5, n_probe=3)
        want = ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=3,
                        kmeans_iters=2)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_query_scan_prunes_cluster_partitions(self, spark, emb,
                                                  tmp_path):
        from maps_spark.sources.ann_index import (build_ivf_index,
                                                  index_stats,
                                                  query_ivf_index)
        from tests.test_plans import plan_of
        root = str(tmp_path / "ivf")
        build_ivf_index(emb, root, n_clusters=8)
        q = query_ivf_index(spark, root, emb.where(F.col("vec_id") == 0),
                            k=3, n_probe=2)
        plan = plan_of(q)
        part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert part and "cluster#" in part[0] and " IN (" in part[0], plan
        stats = index_stats(spark, root)
        assert stats["manifest"]["n_clusters"] == 8
        assert sum(stats["cluster_sizes"].values()) == emb.count()


class TestPacking:
    """Sequence packing + chunking invariants."""

    def test_distributed_cumsum_equals_single_sort(self, spark, docs):
        from maps_spark.operators.corpus import _mix
        from maps_spark.operators.packing import global_cumsum
        from pyspark.sql import Window
        base = docs.select("doc_id", _mix(F.col("doc_id")).alias("ord"),
                           F.size(F.split("text", " ")).cast("long")
                           .alias("n"))
        got = global_cumsum(base, "n", ["ord", "doc_id"], partitions=7)
        w = (Window.orderBy("ord", "doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        want = base.withColumn("cum", F.sum("n").over(w).cast("long"))
        assert got.select("doc_id", "cum").exceptAll(
            want.select("doc_id", "cum")).count() == 0
        assert got.count() == want.count()

    def test_pack_covers_every_token_exactly_once(self, spark, docs):
        from maps_spark.operators.packing import pack_sequences
        p = pack_sequences(docs, budget=512).collect()
        total = sum(r.n_tokens for r in p)
        # offsets stay inside the budget; spans are consistent with
        # offset + length; the token stream is gap-free: sorting by
        # (seq_id, seq_offset) walks 0..total-1 contiguously
        pos = sorted((r.seq_id * 512 + r.seq_offset, r.n_tokens)
                     for r in p)
        cursor = 0
        for start, n in pos:
            assert start == cursor
            cursor += n
        assert cursor == total
        for r in p:
            assert 0 <= r.seq_offset < 512
            assert r.n_seqs == (r.seq_offset + r.n_tokens - 1) // 512 + 1

    def test_pack_stats_full_bins_except_last(self, spark, docs):
        from maps_spark.operators.packing import pack_sequences, pack_stats
        p = pack_sequences(docs, budget=512)
        s = {r.seq_id: r for r in pack_stats(p, budget=512).collect()}
        # every sequence that has a successor where a doc STARTS is
        # accounted; token totals across docs == sum of stats
        assert (sum(r.n_tokens for r in s.values())
                == p.agg(F.sum("n_tokens")).first()[0])

    def test_chunks_reassemble_document(self, spark, docs):
        from maps_spark.operators.packing import chunk_documents
        ch = chunk_documents(docs, chunk=64, stride=48)
        rows = [r for r in ch.collect() if r.doc_id == 7]
        doc = docs.where(F.col("doc_id") == 7).first().text.split(" ")
        assert rows, "doc 7 missing from chunks"
        for r in sorted(rows, key=lambda r: r.chunk_id):
            start = r.chunk_id * 48
            assert r.start_token == start
            want = doc[start:start + 64]
            assert r.chunk_text.split(" ") == want
            assert r.n_chunk_tokens == len(want)
        # stride coverage: last chunk reaches the end of the doc
        last = max(rows, key=lambda r: r.chunk_id)
        assert last.start_token + last.n_chunk_tokens == len(doc)


class TestLmAndSources:
    def test_lm_score_matches_hand_computation(self, spark):
        import math
        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c")], "doc_id long, text string")
        from maps_spark.operators.corpus import lm_score
        got = {r.doc_id: r for r in lm_score(docs).collect()}
        # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1; heads: a->3, b->2;
        # V = 3
        def lp(c2, c1):
            return math.floor(1e6 * math.log((c2 + 1) / (c1 + 3)))
        ab, ba, bc = lp(3, 3), lp(1, 2), lp(1, 2)
        assert got[1].n_bigrams == 3
        assert got[1].nll_scaled == -(ab + ba + ab)
        assert got[2].nll_scaled == -(ab + bc)
        assert got[2].avg_nll_scaled == (-(ab + bc)) // 2

    def test_lm_score_flags_gibberish(self, spark, docs):
        # unique-word docs (every bigram unseen elsewhere) must score
        # higher NLL than the repetitive synthetic corpus average
        from maps_spark.operators.corpus import lm_score
        import pyspark.sql.functions as F
        gib = spark.createDataFrame(
            [(100000 + i, " ".join(f"zq{i}x{j}" for j in range(30)))
             for i in range(5)], "doc_id long, text string")
        both = docs.select("doc_id", "text").unionByName(gib)
        s = lm_score(both)
        g = s.where(F.col("doc_id") >= 100000).agg(
            F.min("avg_nll_scaled")).first()[0]
        c = s.where(F.col("doc_id") < 100000).agg(
            F.avg("avg_nll_scaled")).first()[0]
        assert g > c

    def test_source_stats_flags_junk_source(self, spark):
        from maps_spark.operators.corpus import source_stats
        good = " ".join(["the quick brown fox jumps over a lazy dog"] * 3)
        junk = "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz x"
        rows = ([(i, good, "en", "clean", len(good)) for i in range(4)]
                + [(10 + i, junk, "en", "spam", len(junk))
                   for i in range(4)])
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
                  " n_chars long")
        got = {r.source: r for r in source_stats(docs).collect()}
        assert got["clean"].reputable and got["clean"].n_kept == 4
        assert not got["spam"].reputable and got["spam"].n_kept == 0


class TestCurateCorpus:
    def test_funnel_stages_on_planted_docs(self, spark):
        from maps_spark.operators.corpus import curate_corpus
        good = ("the quick brown fox jumps over the lazy dog while "
                "a bird sings in the tall green tree near the old house "
                "and the river runs to the sea past the busy town")
        near = good.replace("busy town", "quiet village")
        other = ("every morning the baker walks to the market with "
                 "fresh bread and warm cakes for all the hungry people "
                 "who wait in line near the fountain on the square there")
        rows = [(1, good), (2, good),        # 2 -> exact_dup
                (3, near),                   # near-dup of 1
                (4, other),                  # kept
                (5, "zz")]                   # quality (too short)
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r.stage
               for r in curate_corpus(docs).collect()}
        assert got[5] == "quality"
        assert got[2] == "exact_dup"
        assert got[1] == "kept" and got[4] == "kept"
        assert got[3] == "near_dup"

    def test_stages_partition_the_corpus(self, spark, docs):
        from maps_spark.operators.corpus import curate_corpus
        out = curate_corpus(docs)
        assert out.count() == docs.count()
        stages = {r.stage for r in
                  out.select("stage").distinct().collect()}
        assert stages <= {"kept", "quality", "exact_dup", "near_dup"}


class TestDocStore:
    """Bucketed curation store: co-located joins must not shuffle."""

    def test_annotation_join_has_no_exchange(self, spark, docs, tmp_path):
        from maps_spark.operators.text import quality_score
        from maps_spark.sources import doc_store as DS
        from tests.test_plans import plan_of
        root = str(tmp_path / "store")
        DS.create_store(spark, root, "tstore", buckets=8)
        DS.write_table(docs.select("doc_id", "text", "source"),
                       root, "corpus")
        DS.write_table(quality_score(docs), root, "quality")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # force a non-broadcast join so the shuffle would be visible
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = DS.annotation_join(spark, root, "corpus", ["quality"])
            plan = plan_of(j)
            assert "Exchange" not in plan, plan
            assert j.count() == docs.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # the same files read WITHOUT the catalog bucket spec do shuffle
        raw = spark.read.parquet(f"{root}/corpus")
        rawq = spark.read.parquet(f"{root}/quality")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            assert "Exchange" in plan_of(raw.join(rawq, "doc_id"))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_register_existing_recovers_bucket_spec(self, spark, docs,
                                                    tmp_path):
        from maps_spark.sources import doc_store as DS
        root = str(tmp_path / "store2")
        DS.create_store(spark, root, "tstore2", buckets=4)
        DS.write_table(docs.select("doc_id", "lang"), root, "corpus")
        spark.sql("DROP TABLE IF EXISTS tstore2_corpus")
        names = DS.register_existing(spark, root)
        assert names == ["tstore2_corpus"]
        got = DS.read_table(spark, root, "corpus")
        assert got.count() == docs.count()


class TestTokenizeAndProfile:
    def test_tokenize_roundtrips_words(self, spark, docs):
        """Ids decode back to the exact word sequence via the vocab
        inverse, and token counts match the whitespace tokenizer."""
        from maps_spark.operators import corpus as CP
        vocab = CP.build_vocab(docs, min_count=1)
        inv = {r.token_id: r.word for r in vocab.collect()}
        out = {r.doc_id: r for r in
               CP.tokenize_docs(docs, vocab).collect()}
        for r in docs.limit(20).collect():
            words = [w for w in r.text.split(" ") if w]
            got = out[r.doc_id]
            assert got.n_tokens == len(words)
            assert got.n_oov == 0  # min_count=1: every word is in-vocab
            ids = [int(t) for t in got.token_ids.split(",")]
            assert [inv[i] for i in ids] == words

    def test_tokenize_marks_oov(self, spark, docs):
        """With a high min_count, rare words map to unk and are counted
        as OOV; in-vocab ids stay consistent with the smaller vocab."""
        from maps_spark.operators import corpus as CP
        vocab = CP.build_vocab(docs, min_count=50)
        n_vocab = vocab.count()
        assert 0 < n_vocab
        out = CP.tokenize_docs(docs, vocab, unk_id=-1)
        bad = out.where(
            F.expr("exists(split(token_ids, ','), "
                   f"t -> CAST(t AS BIGINT) >= {n_vocab})")).count()
        assert bad == 0
        assert out.agg(F.sum("n_oov")).first()[0] > 0

    def test_profile_brackets_quantiles(self, spark, docs):
        from maps_spark.operators import corpus as CP
        prof = CP.corpus_profile(docs).collect()
        assert sum(r.n_docs for r in prof) == docs.count()
        for r in prof:
            assert r.min_v <= r.p25 <= r.p50 <= r.p75 <= r.p90 <= r.max_v


class TestCorpusDiff:
    def test_diff_categories(self, spark, docs):
        from maps_spark.operators import corpus as CP
        old = docs.where("doc_id % 7 <> 0")
        new = docs.where("doc_id % 5 <> 0").withColumn(
            "text", F.when(F.col("doc_id") % 11 == 0,
                           F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text")))
        got = {r.doc_id: r.change
               for r in CP.corpus_diff(old, new).collect()}
        for r in docs.select("doc_id").collect():
            d = r.doc_id
            in_old, in_new = d % 7 != 0, d % 5 != 0
            want = ("added" if not in_old and in_new else
                    "removed" if in_old and not in_new else
                    "changed" if in_old and in_new and d % 11 == 0
                    else None)
            assert got.get(d) == want, d

    def test_diff_is_shuffle_free_on_bucketed_store(self, spark, docs,
                                                    tmp_path):
        """Both snapshots in one bucketed doc store -> the full outer
        join is co-partitioned and plans with no Exchange."""
        from maps_spark.operators import corpus as CP
        from maps_spark.sources import doc_store as DS
        root = str(tmp_path / "diffstore")
        DS.create_store(spark, root, "dstore", buckets=4)
        DS.write_table(docs.where("doc_id % 7 <> 0")
                       .select("doc_id", "text"), root, "snap_old")
        DS.write_table(docs.where("doc_id % 5 <> 0")
                       .select("doc_id", "text"), root, "snap_new")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            d = CP.corpus_diff(DS.read_table(spark, root, "snap_old"),
                               DS.read_table(spark, root, "snap_new"))
            plan = d._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert d.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_paragraph_dedup_semantics(spark):
    """Canonical-first marking across documents, blank-paragraph guard,
    and clean-text rebuild on a crafted multi-paragraph corpus."""
    from maps_spark.operators.dedup import (drop_dup_paragraphs,
                                            paragraph_dedup)
    rows = [
        (1, "alpha beta\n\ncommon para\n\ngamma"),
        (2, "common para\n\ndelta\n\ncommon para"),   # dup of doc1's,
                                                      # and of itself
        (3, "\n\nunique tail"),                       # leading blank
        (4, "common para"),                           # whole doc is a dup
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    v = {(r.doc_id, r.para_idx): r
         for r in paragraph_dedup(docs).collect()}
    # canonical = (1, 1): first occurrence in doc order
    assert not v[(1, 1)].is_dup
    assert v[(2, 0)].is_dup and v[(2, 0)].dup_of_doc == 1 \
        and v[(2, 0)].dup_of_idx == 1
    assert v[(2, 2)].is_dup and v[(2, 2)].dup_of_doc == 1
    assert v[(4, 0)].is_dup
    # blank paragraphs are never marked (min_chars=1)
    assert not v[(3, 0)].is_dup
    assert v[(3, 0)].dup_of_doc == -1
    # unique paragraphs untouched
    assert not v[(1, 0)].is_dup and not v[(2, 1)].is_dup
    clean = {r.doc_id: r.clean_text
             for r in drop_dup_paragraphs(docs).collect()}
    assert clean[1] == "alpha beta\n\ncommon para\n\ngamma"
    assert clean[2] == "delta"
    assert clean[3] == "\n\nunique tail"
    assert 4 not in clean  # every paragraph was a duplicate


def test_source_divergence_hand_computed(spark):
    """TV distance per source vs corpus, integer-exact: for sources
    A = {a,a,b} and B = {a,b,b,b} the corpus is {a:3, b:4} and
    TV(A) = 10/42, TV(B) = 10/56 (hand-derived)."""
    from maps_spark.operators.corpus import source_divergence
    docs = spark.createDataFrame(
        [(1, "a a b", "A"), (2, "a b b b", "B")],
        "doc_id long, text string, source string")
    out = {r.source: r for r in source_divergence(docs).collect()}
    assert out["A"].n_tokens_vocab == 3
    assert out["A"].tv_num == 10 and out["A"].tv_denom == 42
    assert out["B"].n_tokens_vocab == 4
    assert out["B"].tv_num == 10 and out["B"].tv_denom == 56
    # identical-distribution source: add C = one copy of the corpus mix
    docs2 = spark.createDataFrame(
        [(1, "a a a b b b b", "C"), (2, "a a a b b b b", "D")],
        "doc_id long, text string, source string")
    out2 = {r.source: r for r in source_divergence(docs2).collect()}
    assert out2["C"].tv_num == 0 and out2["D"].tv_num == 0


def test_dup_ngram_coverage_detects_shared_boilerplate(spark):
    from maps_spark.operators.dedup import dup_ngram_coverage
    boiler = "subscribe to our newsletter for all the latest updates today"
    rows = [(1, boiler + " alpha beta gamma delta"),
            (2, boiler + " epsilon zeta eta theta"),
            (3, "completely unrelated text with no shared grams at all ok")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dup_ngram_coverage(docs, k=8).collect()}
    assert out[1]["n_dup_grams"] > 0 and out[2]["n_dup_grams"] > 0
    assert out[3]["n_dup_grams"] == 0
    assert out[3]["dup_coverage_scaled"] == 0
    for r in out.values():
        assert 0 <= r["dup_coverage_scaled"] <= 1_000_000
        assert r["n_dup_grams"] <= r["n_grams"]


def test_hashed_doc_vectors_feed_ann(spark):
    # identical texts -> identical vectors -> exact top-1 neighbor
    from maps_spark.operators.similarity import (brute_force_topk,
                                                 hashed_doc_vectors)
    rows = [(1, "spark sorts the fast table"),
            (2, "spark sorts the fast table"),       # dup of 1
            (3, "completely different words here now")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = hashed_doc_vectors(docs, dim=32).withColumnRenamed(
        "doc_id", "vec_id")
    assert vecs.count() == 3
    for r in vecs.collect():
        n = sum(x * x for x in r["embedding"])
        assert abs(n - 1.0) < 1e-5  # L2-normalized
    top = brute_force_topk(vecs, vecs.where("vec_id = 1"), k=1)
    [hit] = top.collect()
    assert hit["neighbor_id"] == 2
    assert hit["cos_scaled"] >= 999_999_000  # cosine == 1 up to fp


class TestClusterAutoThreshold:
    def test_auto_mode_boundary_falls_through_to_star(self, spark):
        # exactly driver_threshold edges -> driver union-find; one more
        # -> distributed star. Results identical either side.
        from maps_spark.operators import dedup as D
        edges = [(i, i + 1) for i in range(6)]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        calls = []
        orig_driver, orig_star = D._cc_driver, D._cc_star

        def spy_driver(p):
            calls.append("driver")
            return orig_driver(p)

        def spy_star(p, it):
            calls.append("star")
            return orig_star(p, it)

        D._cc_driver, D._cc_star = spy_driver, spy_star
        try:
            at = D.dedup_clusters(pairs, driver_threshold=6).collect()
            over = D.dedup_clusters(pairs, driver_threshold=5).collect()
        finally:
            D._cc_driver, D._cc_star = orig_driver, orig_star
        assert calls == ["driver", "star"]
        norm = lambda rows: sorted(
            (r.doc_id, r.cluster_id, r.cluster_size, r.keep) for r in rows)
        assert norm(at) == norm(over)

    def test_driver_mode_string_ids(self, spark):
        # the Arrow collect path must handle non-long id types too
        from maps_spark.operators.dedup import dedup_clusters
        pairs = spark.createDataFrame(
            [("b", "a"), ("c", "b")], "doc_a string, doc_b string")
        out = {r.doc_id: r for r in
               dedup_clusters(pairs, method="driver").collect()}
        assert set(out) == {"a", "b", "c"}
        assert all(r.cluster_id == "a" for r in out.values())


class TestCurationExtras:
    def test_domain_cap_adaptive_split(self, spark):
        from maps_spark.operators.corpus import domain_cap
        rows = ([(i, f"t{i}", "mega") for i in range(50)]
                + [(100 + i, f"t{i}", "small") for i in range(3)])
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        out = domain_cap(docs, cap=10, domain_col="source").collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r.doc_id)
        # over-cap domain keeps exactly cap lowest ids; small untouched
        assert sorted(by_src["mega"]) == list(range(10))
        assert sorted(by_src["small"]) == [100, 101, 102]

    def test_normalize_text_semantics(self, spark):
        from maps_spark.operators.text import normalize_text
        docs = spark.createDataFrame(
            [(1, "  Hello\tWORLD\x01  again  ")],
            "doc_id long, text string")
        [r] = normalize_text(docs).collect()
        assert r.norm_text == "hello world again"
        assert r.n_chars_raw == 23 and r.n_chars_norm == 17

    def test_embedding_outliers_rank_planted_outlier(self, spark):
        from maps_spark.operators.similarity import embedding_outliers
        base = [0.1] * 4
        rows = ([(i, base, 1) for i in range(9)]
                + [(9, [5.0, -5.0, 5.0, -5.0], 1)])
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")
        out = sorted(embedding_outliers(emb).collect(),
                     key=lambda r: -r.dist2_n2)
        assert out[0].vec_id == 9
        # the nine identical vectors share one (smaller) distance
        rest = {r.dist2_n2 for r in out[1:]}
        assert len(rest) == 1 and out[0].dist2_n2 > rest.pop()


class TestDupSpans:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_cross_doc_duplicate_merges_to_one_span(self, spark):
        from maps_spark.operators.dedup import dup_spans
        shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"  # 10 tokens > L=8
        docs = self._docs(spark, [
            (1, f"a1 a2 a3 {shared} z1 z2"),
            (2, f"b1 {shared} c1 c2 c3"),
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),  # unique, no spans
        ])
        spans = {r.doc_id: (r.span_start, r.span_end, r.span_tokens)
                 for r in dup_spans(docs, min_gram=8).collect()}
        # three overlapping dup 8-grams merge into ONE 10-token span
        assert spans[1] == (3, 12, 10)
        assert spans[2] == (1, 10, 10)
        assert 3 not in spans

    def test_within_doc_repetition_counts_as_duplicate(self, spark):
        from maps_spark.operators.dedup import dup_spans
        block = " ".join(f"r{i}" for i in range(8))
        docs = self._docs(spark, [(1, f"{block} mid1 mid2 {block}")])
        spans = sorted((r.span_start, r.span_end) for r in
                       dup_spans(docs, min_gram=8).collect())
        assert spans == [(0, 7), (10, 17)]

    def test_short_docs_and_stats(self, spark):
        from maps_spark.operators.dedup import dup_span_stats
        dup8 = " ".join(f"d{i}" for i in range(8))
        docs = self._docs(spark, [
            (1, "too short"),           # < L tokens: no grams
            (2, f"{dup8} x1 x2"),       # 10 tokens, 8 duplicated
            (3, f"y1 {dup8} y2 y3"),    # 11 tokens, 8 duplicated
        ])
        st = {r.doc_id: r for r in
              dup_span_stats(docs, min_gram=8).collect()}
        assert st[1].n_tokens == 2 and st[1].dup_tokens == 0
        assert st[2].dup_tokens == 8
        assert st[2].dup_frac_scaled == 8 * 1_000_000 // 10
        assert st[3].dup_frac_scaled == 8 * 1_000_000 // 11

    def test_scrub_rebuilds_without_spans(self, spark):
        from maps_spark.operators.dedup import scrub_dup_spans
        block = " ".join(f"s{i}" for i in range(8))
        docs = self._docs(spark, [
            (1, f"keep1 {block} keep2"),
            (2, f"{block}"),                 # fully covered -> drops
            (3, "only unique tokens here live"),
        ])
        out = {r.doc_id: r for r in
               scrub_dup_spans(docs, min_gram=8).collect()}
        assert out[1].clean_text == "keep1 keep2"
        assert out[1].n_removed_tokens == 8
        assert 2 not in out  # every token duplicated
        assert out[3].clean_text == "only unique tokens here live"
        assert out[3].n_removed_tokens == 0


def test_grouped_split_no_leakage(spark):
    from maps_spark.operators.corpus import grouped_split
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = grouped_split(docs, val_frac=0.25).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.source, set()).add(r.split)
    # every group lands entirely on one side — no leakage
    assert all(len(s) == 1 for s in by_group.values())
    splits = {g: next(iter(s)) for g, s in by_group.items()}
    assert "val" in splits.values() and "train" in splits.values()
    # deterministic across calls
    again = {(r.doc_id, r.split)
             for r in grouped_split(docs, val_frac=0.25).collect()}
    assert again == {(r.doc_id, r.split) for r in out}


def test_containment_catches_quoted_subset(spark):
    # a short doc quoted inside a long one: Jaccard is small, but
    # containment on the short side is 1.0
    from maps_spark.operators.dedup import (containment_pairs,
                                            ngram_jaccard_pairs)
    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, quote), (2, f"{filler} {quote} {filler}")],
        "doc_id long, text string")
    out = containment_pairs(docs, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.cont_a_scaled == 1_000_000   # all of doc 1 is inside doc 2
    assert r.cont_b_scaled < 100_000
    # symmetric Jaccard at the same bar misses the pair entirely
    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0


def test_winnow_pairs_finds_quoted_passage(spark):
    """winnow_pairs surfaces a shared quoted run between otherwise
    different documents, and the hot-hash df cap kills corpus-wide
    boilerplate fingerprints."""
    from maps_spark.operators.text import winnow_pairs
    shared = "the exact common quoted passage appears verbatim here now"
    rows = [(1, "alpha beta " + shared + " gamma delta"),
            (2, "one two three " + shared + " four five six")]
    # 30 docs all ending with the same boilerplate: with max_df=10 the
    # boilerplate hashes are dropped, so no pairs among them
    boiler = "all rights reserved contact us terms of service apply"
    rows += [(100 + i, f"unique{i} words{i * 3} here{i * 7} " + boiler)
             for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_pairs(docs, min_shared=2, max_df=10).collect()
    ids = {(r.doc_a, r.doc_b): r.n_shared for r in pairs}
    assert (1, 2) in ids and ids[(1, 2)] >= 2
    assert all(a < 100 for a, _ in ids), ids


def test_compression_signals_order_and_accounting(spark):
    """Planted ordering: heavily repetitive text must compress far
    better (lower ratio) than high-entropy text; byte accounting is
    exact; empty docs report zero."""
    import zlib
    from maps_spark.operators.text import compression_signals
    rep = "the same phrase again and again " * 40
    div = " ".join(f"w{(i * 2654435761) % 100003}x{i * i % 997}"
                   for i in range(200))
    rows = [(1, rep), (2, div), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_signals(docs).collect()}
    assert out[1].ratio_scaled < out[2].ratio_scaled / 3
    for i, t in rows:
        assert out[i].n_bytes == len(t.encode("utf-8"))
        if t:
            assert out[i].n_compressed == len(
                zlib.compress(t.encode("utf-8"), 6))
    assert out[3].ratio_scaled == 0 and out[3].n_compressed > 0


def test_lz_complexity_goldens_and_ordering(spark):
    """LZ78 phrase counts against hand-computed parses, the same
    repetitive-vs-diverse ordering contract as the zlib signal, and
    the trailing-known-phrase convention ('aaaa' -> a, aa, a = 3)."""
    from maps_spark.operators.text import lz_complexity
    rep = "ababab" * 30
    div = " ".join(f"w{(i * 2654435761) % 100003}" for i in range(60))
    rows = [(1, "aaaa"), (2, "abcabcabc"), (3, ""),
            (4, "to be or not to be"), (5, rep), (6, div)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in lz_complexity(docs).collect()}
    assert out[1].n_phrases == 3      # a, aa, a(trailing)
    assert out[2].n_phrases == 6      # a, b, c, ab, ca, bc(trailing)
    assert out[3].n_phrases == 0 and out[3].density_scaled == 0
    assert out[4].n_phrases == 12
    for i, t in rows:
        assert out[i].n_chars == len(t)
    # repetitive text parses far denser than diverse text
    assert out[5].density_scaled < out[6].density_scaled / 2


def test_quality_ensemble_semantics(spark):
    """Rank normalization: scale-free (multiplying a signal by 1000
    changes nothing), per-group (one group's outlier can't shift
    another's ranks), signed weights penalize."""
    from maps_spark.operators.text import quality_ensemble
    rows = [(i, "a", i * 10, 100 - i) for i in range(10)]
    rows += [(100 + i, "b", i * 1_000_000, i) for i in range(10)]
    sigs = spark.createDataFrame(
        rows, "doc_id long, source string, s1 long, s2 long")
    out = {r.doc_id: r.score_scaled
           for r in quality_ensemble(
               sigs, {"s1": 1_000_000}).collect()}
    # within each group, score follows s1's rank: 0..1e6 regardless of
    # the groups' wildly different magnitudes
    assert out[0] == 0 and out[9] == 1_000_000
    assert out[100] == 0 and out[109] == 1_000_000
    # scaling s1 by 1000 changes nothing (rank-normalized)
    scaled = sigs.withColumn("s1", F.col("s1") * 1000)
    out2 = {r.doc_id: r.score_scaled
            for r in quality_ensemble(
                scaled, {"s1": 1_000_000}).collect()}
    assert out == out2
    # negative weight flips the ordering contribution
    neg = {r.doc_id: r.score_scaled
           for r in quality_ensemble(
               sigs, {"s1": 600_000, "s2": -400_000}).collect()}
    # in group a, s2 decreases as s1 increases -> both favor high i
    assert neg[9] == max(neg[i] for i in range(10))


def test_soft_dedup_weights_mass_conservation(spark):
    """Each duplicate cluster contributes ~one doc of expected mass:
    planted 4-copy cluster gets weight scale/4 each; singletons full."""
    from maps_spark.operators.dedup import (dedup_clusters,
                                            ngram_jaccard_pairs,
                                            soft_dedup_weights)
    quad = "the very same duplicated text appears here in every copy"
    rows = [(i, quad) for i in range(4)]
    rows += [(100 + i, " ".join(f"u{i}w{j * 7 % 53}" for j in range(12)))
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(docs, threshold=0.25)
    out = {r.doc_id: (r.cluster_size, r.weight_scaled)
           for r in soft_dedup_weights(
               docs, dedup_clusters(pairs)).collect()}
    for i in range(4):
        assert out[i] == (4, 250_000)
    for i in range(5):
        assert out[100 + i] == (1, 1_000_000)


def test_winnow_contamination_catches_verbatim_quote(spark):
    """A doc quoting a benchmark passage of >= window+k-1 tokens must
    show nonzero contamination (the winnowing guarantee applied to
    decontamination); unrelated docs stay at zero."""
    from maps_spark.operators.text import winnow_contamination
    bench_text = ("question which river is the longest in the world "
                  "answer the nile by most measures")
    bench = spark.createDataFrame([(1, bench_text)],
                                  "doc_id long, text string")
    docs = spark.createDataFrame(
        [(10, "intro words " + bench_text + " closing remark"),
         (11, " ".join(f"clean{i}tok{i * 13 % 97}" for i in range(30)))],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           winnow_contamination(docs, bench).collect()}
    assert out[10].n_contaminated > 0
    assert out[10].contamination_scaled > 0
    assert out[11].n_contaminated == 0
    assert out[11].n_fingerprints > 0


def test_bloom_contamination_no_false_negatives(spark):
    """The bloom path must flag every shingle the exact check flags
    (bloom filters have no false negatives); with a roomy filter the
    unrelated doc stays clean too."""
    from maps_spark.operators.corpus import (bloom_contamination,
                                             contamination_check)
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma unrelated words here"),
         (3, "nothing shared with that suite at all")],
        "doc_id long, text string")
    bl = {r.doc_id: r for r in
          bloom_contamination(docs, bench, m_bits=1 << 20).collect()}
    ex = {r.doc_id: r for r in
          contamination_check(docs, bench).collect()}
    assert bl[1].contamination_scaled == 1_000_000 and bl[1].flagged
    for d in (1, 2, 3):
        assert bl[d].n_flagged >= ex[d].n_contaminated
        assert bl[d].n_shingles == ex[d].n_shingles
    assert bl[3].n_flagged == 0 and not bl[3].flagged


def test_bloom_contamination_fp_bounded_and_deterministic(spark):
    """A deliberately tiny filter (64 bits) forces false positives;
    they must be deterministic across runs and still a superset of
    the exact answer — the documented bloom trade-off."""
    from maps_spark.operators.corpus import (bloom_contamination,
                                             contamination_check)
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(2, "alpha beta gamma unrelated words here"),
         (3, "nothing shared with that suite at all")],
        "doc_id long, text string")
    r1 = {r.doc_id: (r.n_flagged, r.contamination_scaled)
          for r in bloom_contamination(docs, bench,
                                       m_bits=64).collect()}
    r2 = {r.doc_id: (r.n_flagged, r.contamination_scaled)
          for r in bloom_contamination(docs, bench,
                                       m_bits=64).collect()}
    assert r1 == r2
    ex = {r.doc_id: r.n_contaminated
          for r in contamination_check(docs, bench).collect()}
    for d in (2, 3):
        assert r1[d][0] >= ex[d]


def test_fuzzy_pairs_finds_typos_and_matches_brute_force(spark):
    from maps_spark.operators.dedup import fuzzy_pairs
    rows = [
        (1, "the quick brown fox jumps over dogs"),
        (2, "the quick brown fox jumps over dgos"),   # transposition
        (3, "the quick brown fox jumped over dog"),   # small edits
        (4, "completely different sentence here now"),
        (5, "zebras graze quietly near the river bank"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string")
    got = {(r.id_a, r.id_b): r.dist
           for r in fuzzy_pairs(df, max_dist=5).collect()}
    # brute force oracle via python
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]
    want = {}
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        d = lev(ta, tb)
        if d <= 5:
            want[(min(ia, ib), max(ia, ib))] = d
    assert got == want and (1, 2) in got and got[(1, 2)] == 2


def test_fuzzy_pairs_hot_gram_cap_drops_boilerplate_block(spark):
    from maps_spark.operators.dedup import fuzzy_pairs
    # every title shares the boilerplate gram source; with the cap the
    # only surviving block is the distinctive tail
    rows = [(i, f"common prefix text variant {chr(97 + i)}")
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, title string")
    uncapped = fuzzy_pairs(df, max_dist=2).count()
    capped = fuzzy_pairs(df, max_dist=2, max_gram_df=3).count()
    # titles differ by one char -> all 15 pairs within distance 2;
    # the cap only prunes CANDIDATES, and the distinctive final gram
    # has df=1, so verified pairs can only shrink via blocking
    assert uncapped == 15 and capped <= uncapped


def test_kmeans_recovers_planted_blobs_and_descends(spark):
    from maps_spark.operators.similarity import kmeans_assign
    import random
    rng = random.Random(11)
    centers = [[5.0] * 8, [-5.0] * 8, [5.0] * 4 + [-5.0] * 4]
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [v + rng.uniform(-0.5, 0.5) for v in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(df, k=3, iters=4).collect()
    # every planted blob maps to exactly one learned cluster
    blob_to_cluster = {}
    for r in out:
        b = r["vec_id"] % 3
        blob_to_cluster.setdefault(b, set()).add(r["cluster"])
    assert all(len(cs) == 1 for cs in blob_to_cluster.values())
    assert len({next(iter(cs)) for cs in blob_to_cluster.values()}) == 3
    # objective is non-increasing with more Lloyd's rounds
    tot = [sum(r["dist2"] for r in kmeans_assign(df, k=3, iters=i)
               .collect()) for i in (0, 2, 4)]
    assert tot[0] >= tot[1] >= tot[2]


def test_kmeans_survives_duplicate_seed_vectors(spark):
    from maps_spark.operators.similarity import kmeans_assign
    # all points identical: every distance ties at 0, cluster 0 wins
    # the tie-break everywhere, other clusters stay on their seeds
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(10)],
        "vec_id long, embedding array<float>")
    out = kmeans_assign(df, k=3, iters=2).collect()
    assert len(out) == 10
    assert all(r["cluster"] == 0 and r["dist2"] == 0 for r in out)


def test_pq_adc_ranks_same_blob_first(spark):
    from maps_spark.operators.similarity import pq_encode, pq_topk
    import random
    rng = random.Random(5)
    centers = [[8.0] * 8, [-8.0] * 8, [8.0] * 4 + [-8.0] * 4,
               [-8.0] * 4 + [8.0] * 4]
    rows = [(i, [v + rng.uniform(-0.5, 0.5) for v in centers[i % 4]])
            for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # codes: one row per (vector, subspace), codes within range
    books, codes = pq_encode(df, m=2, n_cent=4, iters=3)
    cd = codes.collect()
    assert len(cd) == 160
    assert all(0 <= r["code"] < 4 and r["subspace"] in (0, 1)
               for r in cd)
    assert len(books) == 2 and all(len(b) == 4 for b in books)
    # ADC: every query's top-10 neighbours come from its own blob
    qs = df.where("vec_id < 4")
    top = pq_topk(df, qs, k_results=10, m=2, n_cent=4,
                  iters=3).collect()
    assert len(top) == 40
    for r in top:
        assert r["vec_id"] % 4 == r["qid"] % 4
        assert r["adist2"] >= 0


def test_pq_bounded_training_contract(spark):
    """train_sample semantics: a bound >= corpus is a no-op (codes
    byte-identical to full training), a real bound still encodes the
    FULL corpus and keeps blob recall — training shrinks, serving
    coverage does not."""
    import random

    from maps_spark.operators.similarity import ann_recall, pq_encode
    rng = random.Random(11)
    centers = [[9.0 * ((c >> b) & 1) - 4.5 for b in range(8)]
               for c in range(6)]
    rows = [(i, [v + rng.uniform(-0.4, 0.4) for v in centers[i % 6]])
            for i in range(66)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<float>")
    full_books, full_codes = pq_encode(df, m=2, n_cent=8, iters=3)
    noop_books, noop_codes = pq_encode(df, m=2, n_cent=8, iters=3,
                                       train_sample=1000)
    assert noop_books == full_books
    key = lambda r: (r["vec_id"], r["subspace"])  # noqa: E731
    assert sorted(map(lambda r: r.asDict(), noop_codes.collect()),
                  key=key) == \
        sorted(map(lambda r: r.asDict(), full_codes.collect()), key=key)
    # real bound: every vector still gets codes, recall floor holds
    _, bcodes = pq_encode(df, m=2, n_cent=8, iters=3, train_sample=30)
    assert bcodes.select("vec_id").distinct().count() == 66
    rec = ann_recall(df, df.where("vec_id < 6"), k=10, method="pq",
                     m=2, n_cent=8, iters=3, train_sample=30)
    out = rec.collect()
    assert (sum(r["n_hits"] for r in out)
            / sum(r["n_exact"] for r in out)) >= 0.9


def test_pq_recall_high_on_structured_data(spark):
    """On data with real cluster structure (where ANN is used), the
    PQ-compressed index recalls almost all true neighbours; the gate
    dataset is near-random, so its measured recall (~0.3 at m=8) is
    the documented floor, not the representative number."""
    from maps_spark.operators.similarity import ann_recall
    import random
    rng = random.Random(23)
    centers = [[9.0 * ((c >> b) & 1) - 4.5 for b in range(8)]
               for c in range(6)]
    # 11 vectors per blob: each query's exact top-10 is exactly its
    # 10 blob-mates, and PQ's coarse codes keep whole blobs together,
    # so recall approaches 1 — quantization only loses recall when it
    # must ORDER more same-code candidates than k (a tie-break draw,
    # not a retrieval failure)
    rows = [(i, [v + rng.uniform(-0.4, 0.4) for v in centers[i % 6]])
            for i in range(66)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    rec = ann_recall(df, df.where("vec_id < 6"), k=10, method="pq",
                     m=2, n_cent=8, iters=3)
    out = rec.collect()
    tot_e = sum(r["n_exact"] for r in out)
    tot_h = sum(r["n_hits"] for r in out)
    assert tot_e == 60
    assert tot_h / tot_e >= 0.9


def test_cluster_topics_separates_planted_vocabularies(spark):
    from maps_spark.operators.corpus import cluster_topics
    import random
    rng = random.Random(31)
    vocab_a = ["apple", "banana", "cherry", "date", "elder"]
    vocab_b = ["zinc", "yarrow", "xenon", "walnut", "vole"]
    rows = []
    for i in range(40):
        v = vocab_a if i % 2 == 0 else vocab_b
        rows.append((i, " ".join(rng.choice(v) for _ in range(30))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = cluster_topics(docs, k=2, iters=4, top_k=5).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["word"])
    assert len(by_cluster) == 2
    tops = sorted(frozenset(v) for v in by_cluster.values())
    assert {frozenset(vocab_a), frozenset(vocab_b)} == set(tops) or \
        all(ws <= set(vocab_a) or ws <= set(vocab_b)
            for ws in by_cluster.values())
    # rank is dense 1..top_k per cluster, counts non-increasing
    for c, words in by_cluster.items():
        rs = sorted(r["rank"] for r in out if r["cluster"] == c)
        assert rs == list(range(1, len(rs) + 1))
        cnts = [r["cnt"] for r in sorted(
            (x for x in out if x["cluster"] == c),
            key=lambda x: x["rank"])]
        assert cnts == sorted(cnts, reverse=True)


def test_pq_index_roundtrip_matches_fresh(spark, tmp_path):
    from maps_spark.operators.similarity import pq_topk
    from maps_spark.sources.ann_index import (build_pq_index,
                                              load_pq_codebooks,
                                              query_pq_index)
    import random
    rng = random.Random(41)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    root = str(tmp_path / "pqidx")
    build_pq_index(df, root, m=4, n_cent=8, iters=2)
    books = load_pq_codebooks(spark, root)
    assert len(books) == 4 and all(len(b) == 8 for b in books)
    assert all(len(c) == 4 for b in books for c in b)
    qs = df.where("vec_id < 5")
    served = {(r.qid, r.vec_id): (r.adist2, r.rank)
              for r in query_pq_index(spark, root, qs).collect()}
    fresh = {(r.qid, r.vec_id): (r.adist2, r.rank)
             for r in pq_topk(df, qs, m=4, n_cent=8, iters=2).collect()}
    assert served == fresh and len(served) == 50


def test_ivfpq_with_full_probe_equals_pure_pq(spark):
    """Probing every inverted list removes the IVF pruning, so the
    composition must reduce exactly to the pure ADC ranking."""
    from maps_spark.operators.similarity import ivfpq_topk, pq_topk
    import random
    rng = random.Random(47)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)])
            for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.where("vec_id < 4")
    full = {(r.qid, r.vec_id): (r.adist2, r.rank) for r in ivfpq_topk(
        df, qs, n_clusters=4, n_probe=4, m=4, n_cent=8).collect()}
    pure = {(r.qid, r.vec_id): (r.adist2, r.rank) for r in pq_topk(
        df, qs, m=4, n_cent=8).collect()}
    assert full == pure and len(full) == 40
    # with real pruning the result is a subset ranking: every returned
    # pair's distance also appears in the pure ADC table
    pruned = ivfpq_topk(df, qs, n_clusters=4, n_probe=1,
                        m=4, n_cent=8).collect()
    assert pruned and all(r.rank <= 10 for r in pruned)
    pure_d = {(r.qid, r.vec_id): r.adist2 for r in pq_topk(
        df, qs, m=4, n_cent=8, k_results=80).collect()}
    for r in pruned:
        assert pure_d[(r.qid, r.vec_id)] == r.adist2


def test_pq_upsert_encodes_identically_and_is_idempotent(spark,
                                                         tmp_path):
    from maps_spark.sources.ann_index import (build_pq_index,
                                              query_pq_index,
                                              upsert_pq_index)
    import random
    rng = random.Random(53)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)])
            for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    old, new = df.where("vec_id < 60"), df.where("vec_id >= 60")
    # index built on the old batch, new batch upserted with the
    # STORED books must serve the same top-k as an index whose codes
    # cover all vectors under those same books
    root = str(tmp_path / "pq_upsert")
    build_pq_index(old, root, m=4, n_cent=8, iters=2)
    r1 = upsert_pq_index(new, root)
    assert r1 == {"appended": 20, "skipped_existing": 0}
    # replaying the same batch is a no-op
    r2 = upsert_pq_index(new, root)
    assert r2 == {"appended": 0, "skipped_existing": 20}
    qs = df.where("vec_id < 4")
    served = query_pq_index(spark, root, qs)
    got_ids = {r.vec_id for r in served.collect()}
    # new vectors are findable: at least one upserted id can appear,
    # and the full id space is covered by the code table
    n_codes = spark.read.parquet(f"{root}/pq_codes").count()
    assert n_codes == 80
    assert got_ids <= set(range(80)) and len(got_ids) >= 10
    # the stored codes for the upserted batch are exactly what a
    # fixed-books encode produces — upsert never drifts the encoding
    from maps_spark.sources.ann_index import load_pq_codebooks
    from maps_spark.operators.similarity import pq_encode_with_books
    books = load_pq_codebooks(spark, root)
    want = {(r.vec_id, r.subspace): r.code
            for r in pq_encode_with_books(new, books).collect()}
    stored = spark.read.parquet(f"{root}/pq_codes") \
        .where("vec_id >= 60").collect()
    for r in stored:
        for s, c in enumerate(r.codes):
            assert want[(r.vec_id, s)] == c


def test_dedup_method_overlap_invariants(spark):
    from maps_spark.operators.dedup import dedup_method_overlap
    import random
    rng = random.Random(61)
    words = [f"w{i}" for i in range(120)]
    base = " ".join(rng.choice(words) for _ in range(80))
    rows = [(0, base), (1, base)]  # verbatim dup: every method's catch
    for i in range(2, 22):
        rows.append((i, " ".join(rng.choice(words) for _ in range(80))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_method_overlap(docs).collect()
    assert len(out) == 10
    for r in out:
        assert r.method_a < r.method_b
        assert 0 <= r.n_common <= min(r.n_a, r.n_b)
        # the planted verbatim pair is in every method's set, so every
        # pairwise intersection is non-empty
        assert r.n_common >= 1 and r.n_a >= 1 and r.n_b >= 1


def test_bm25_ranks_relevance(spark):
    """Planted relevance: the doc repeating the query's rare terms
    outranks one mentioning them once; a doc sharing only ubiquitous
    terms ranks below both (idf discounts it); self-retrieval on the
    gate configuration puts each query's source doc at rank 1; a
    query with no indexed term emits nothing."""
    from maps_spark.operators.retrieval import bm25_topk
    filler = "the data table row value scan"
    docs = spark.createDataFrame(
        [(0, "zebra quagga zebra quagga zebra " + filler),
         (1, "zebra once here and nothing else rare " + filler),
         (2, filler + " " + filler + " " + filler),
         (3, "unrelated words entirely about other things " + filler)],
        "doc_id long, text string")
    q = spark.createDataFrame([(100, "zebra quagga the")],
                              "query_id long, text string")
    out = bm25_topk(docs, q, k=4).orderBy("rank").collect()
    order = [r.doc_id for r in out]
    assert order[0] == 0 and order[1] == 1, order
    assert order.index(2) > order.index(1)  # filler-only ranks below
    assert all(out[i].score_scaled >= out[i + 1].score_scaled
               for i in range(len(out) - 1))
    # empty/unindexed query: no rows
    q2 = spark.createDataFrame([(200, "xylophone")],
                               "query_id long, text string")
    assert bm25_topk(docs, q2).count() == 0
    # gate configuration at sf0.001: structural sanity (the synthetic
    # corpus shares one tiny vocabulary, so BM25 rightly prefers the
    # shortest docs repeating the probe words over the source doc —
    # no self-retrieval expectation holds there)
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMALL
    from maps_spark.operators.retrieval import probe_queries
    corpus = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    top = bm25_topk(corpus, probe_queries(corpus, n_queries=4),
                    k=10).collect()
    per_q = {r.query_id for r in top if r.rank == 1}
    assert per_q == {0, 1, 2, 3}
    assert all(r.score_scaled > 0 for r in top)
    assert all(1 <= r.rank <= 10 for r in top)


def test_pagerank_matches_independent_replication(spark):
    """The distributed power iteration equals a dict-based Python
    replication of the same integer recurrence on an adversarial
    little graph (cycle + dangler + hub + duplicate edges), and basic
    rank order holds: the node every other node links to outranks the
    dangler feeding it."""
    from maps_spark.operators.graph import PR_SCALE, pagerank
    raw = [("a", "b"), ("b", "c"), ("c", "a"),   # cycle
           ("a", "hub"), ("b", "hub"), ("c", "hub"),
           ("d", "hub"),                          # d has out, no in
           ("a", "hub"),                          # duplicate edge
           ("hub", "sink")]                       # sink dangles
    edges = spark.createDataFrame(raw, "src string, dst string")
    got = {r.node: r.rank_scaled
           for r in pagerank(edges, iters=4).collect()}

    e = sorted(set(raw))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    base = (PR_SCALE * 15) // (100 * n)
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(4):
        s = {v: 0 for v in nodes}
        for u, v in e:
            s[v] += r[u] // out[u]
        r = {v: base + (85 * s[v]) // 100 for v in nodes}
    assert got == r
    assert got["hub"] > got["a"] > got["d"]
    assert got["sink"] > 0  # fed only by hub, still ranked

def test_hits_matches_independent_replication(spark):
    """The distributed hub/authority iteration equals a dict-based
    Python replication of the same integer recurrence (duplicate
    edges collapsed, integer L1 rescale each half-step), and the
    classic order holds: the page linked by two hubs out-ranks the
    one linked by one; pure authorities have hub 0."""
    from maps_spark.operators.graph import HITS_SCALE, hits
    raw = [("h1", "a1"), ("h1", "a2"), ("h2", "a1"),
           ("h1", "a1"),                # duplicate edge
           ("a2", "h2")]                # back-edge: a2 is also a hub
    edges = spark.createDataFrame(raw, "src string, dst string")
    got = {r.node: (r.hub_scaled, r.auth_scaled)
           for r in hits(edges, iters=2).collect()}

    e = sorted(set(raw))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    h = {v: HITS_SCALE for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(2):
        raw_a = {v: 0 for v in nodes}
        for u, v in e:
            raw_a[v] += h[u]
        t = sum(raw_a.values())
        a = {v: raw_a[v] // max(1, t // HITS_SCALE) for v in nodes}
        raw_h = {v: 0 for v in nodes}
        for u, v in e:
            raw_h[u] += a[v]
        t = sum(raw_h.values())
        h = {v: raw_h[v] // max(1, t // HITS_SCALE) for v in nodes}
    assert got == {v: (h[v], a[v]) for v in nodes}
    assert got["a1"][1] > got["a2"][1] > 0   # two hubs beat one
    assert got["h1"][0] > got["h2"][0] > 0   # h1 links both top auths
    assert got["a1"][0] == 0                 # no out-edges -> hub 0

def test_collocations_hand_computed(spark):
    """The one pair above min_count matches the hand-computed staged
    integer lift; high-frequency-but-unassociated pairs are discounted
    relative to a tight collocation on a corpus built to show it."""
    from maps_spark.operators.corpus import collocations
    docs = spark.createDataFrame(
        [(1, "new york new york is big"),
         (2, "the city of new york")],
        "doc_id long, text string")
    got = collocations(docs, min_count=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.w1, r.w2, r.c_pair, r.c_w1, r.c_w2) == (
        "new", "york", 3, 3, 3)
    # ((3 * 1e6) div 3) * 11 tokens div 3 = 11_000_000 div 3
    assert r.lift_scaled == 3_666_666

    # ranking: "of the" (frequent everywhere) scores below "san
    # francisco" (always together) even with equal pair counts
    docs2 = spark.createDataFrame(
        [(1, "of the san francisco of a the b of c the d"),
         (2, "of the san francisco x of y the z of w the v")],
        "doc_id long, text string")
    by_pair = {(r.w1, r.w2): r.lift_scaled
               for r in collocations(docs2, min_count=2).collect()}
    assert by_pair[("san", "francisco")] > by_pair[("of", "the")]

def test_sentence_split_and_readability(spark):
    """synthesize_prose -> sentence_split roundtrip recovers the
    doc-dependent sentence lengths; readability matches a
    hand-computed Flesch value and orders simple text above
    polysyllabic text."""
    from maps_spark.operators.text import (readability, sentence_split,
                                           synthesize_prose)
    docs = spark.createDataFrame(
        [(1, "a b c d e f g")],          # slen = 1 % 5 + 4 = 5
        "doc_id long, text string")
    prose = synthesize_prose(docs)
    assert prose.collect()[0].text == "a b c d e. f g."
    sents = sentence_split(prose).orderBy("sent_idx").collect()
    assert [(r.sent_idx, r.sentence, r.n_words) for r in sents] == [
        (0, "a b c d e", 5), (1, "f g", 2)]

    hand = spark.createDataFrame(
        [(1, "spark table."),            # W=2 S=1 Y=1+2=3
         (2, "extraordinarily heterogeneous administration bureaucracy.")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in readability(hand).collect()}
    r1 = got[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (2, 1, 3)
    assert r1.fre_milli == 206835 - 2030 - (84600 * 3) // 2
    assert got[1].fre_milli > got[2].fre_milli  # simple reads easier

def test_hits_select_iters0_matches_spark():
    """The unrolled oracle is valid SQL at the iters=0 boundary and
    returns the Spark twin's initial state (hub=scale, auth=0)."""
    import duckdb

    from maps_spark.operators.graph import HITS_SCALE, hits_select
    q = hits_select("SELECT 'a' AS src, 'b' AS dst", iters=0)
    rows = sorted(duckdb.connect().execute(q).fetchall())
    assert rows == [("a", HITS_SCALE, 0), ("b", HITS_SCALE, 0)]

def test_novelty_score_hand_computed(spark):
    """Distinct-gram novelty: a copied span's grams are non-novel in
    both docs, unique prose is novel, short docs fall back to a
    whole-text gram."""
    from maps_spark.operators.corpus import novelty_score
    shared = "alpha beta gamma"          # one shared 3-gram
    docs = spark.createDataFrame(
        [(1, f"{shared} delta"),         # grams: abg, bgd
         (2, f"zeta {shared}"),          # grams: zab, abg
         (3, "tiny doc")],               # < k tokens -> one gram
        "doc_id long, text string")
    got = {r.doc_id: r for r in novelty_score(docs, k=3).collect()}
    # doc1: 'alpha beta gamma' df=2 (non-novel), 'beta gamma delta' df=1
    assert (got[1].n_grams, got[1].n_novel) == (2, 1)
    assert got[1].novelty_scaled == 500_000
    assert (got[2].n_grams, got[2].n_novel) == (2, 1)
    assert (got[3].n_grams, got[3].n_novel) == (1, 1)
    assert got[3].novelty_scaled == 1_000_000


def test_cross_source_dup_matrix_planted(spark):
    """Near-dup pairs roll up to an unordered source-pair matrix:
    a cross-source copy lands in (srcA, srcB) regardless of id order,
    a same-source copy in the diagonal."""
    from maps_spark.operators.dedup import cross_source_dup_matrix
    base = " ".join(f"w{i}" for i in range(60))
    other = " ".join(f"x{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, "srcB", base), (2, "srcA", base),      # cross-source dup
         (3, "srcA", other), (4, "srcA", other)],   # same-source dup
        "doc_id long, source string, text string")
    got = {(r.source_a, r.source_b): r.n_pairs
           for r in cross_source_dup_matrix(
               docs, hasher="reproducible").collect()}
    assert got[("srcA", "srcB")] >= 1   # least/greatest canonical
    assert got[("srcA", "srcA")] >= 1
    assert ("srcB", "srcA") not in got


def test_rrf_fuse_closed_form(spark):
    """Reciprocal-rank fusion over two planted lists: exact integer
    contributions (1e6 div (60 + r)), consensus documents outrank
    single-list documents, ties break on doc_id."""
    from maps_spark.operators.retrieval import rrf_fuse
    bm = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id long, doc_id long, rank int")
    an = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2), (0, 10, 3)],
        "query_id long, doc_id long, rank int")
    got = {r.doc_id: (r.rrf_scaled, r.n_lists, r.rank)
           for r in rrf_fuse([bm, an]).collect()}
    c = lambda r: 1_000_000 // (60 + r)
    # doc 11: ranks 2 and 1; doc 10: ranks 1 and 3
    assert got[11] == (c(2) + c(1), 2, 1)
    assert got[10] == (c(1) + c(3), 2, 2)
    assert got[12] == (c(3), 1, 4) and got[13] == (c(2), 1, 3)


def test_expectation_report_planted(spark):
    """Closed-form expectation checks: a planted NULL, a range
    violation, a duplicate key and a NULL key component are each
    counted by exactly the right rule."""
    from maps_spark.operators.expectations import expectation_report
    df = spark.createDataFrame(
        [(1, "alpha", 10), (2, None, 5), (2, "beta", -1),
         (None, "gamma", 3)],
        "id long, name string, score long")
    rep = {r.rule_id: (r.n_rows, r.n_violations, r.passed)
           for r in expectation_report(
               df,
               conditions={"name_not_null": "name IS NOT NULL",
                           "score_non_negative": "score >= 0",
                           "always_true": "1 = 1"},
               unique={"id_unique": ["id"],
                       "id_name_unique": ["id", "name"]}).collect()}
    assert rep["name_not_null"] == (4, 1, False)
    assert rep["score_non_negative"] == (4, 1, False)
    assert rep["always_true"] == (4, 0, True)
    # ids: 1, 2, 2, NULL -> 2 distinct valid keys, 2 surplus rows
    assert rep["id_unique"] == (4, 2, False)
    # (id, name): (1,alpha), (2,NULL)->invalid, (2,beta), (NULL,gamma)
    # ->invalid => 2 distinct valid keys, 2 violations
    assert rep["id_name_unique"] == (4, 2, False)


def test_expectation_report_single_scan_plan(spark):
    """All row-level condition rules share ONE aggregation pass:
    exactly one scan of the input in the executed plan."""
    from maps_spark.operators.expectations import (GATE_CONDITIONS,
                                                   expectation_report)
    from tests.conftest import SF_SMALL
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    rep = expectation_report(docs, GATE_CONDITIONS)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_expectation_report_empty_table(spark):
    """An empty table violates nothing: condition rules report 0/true
    (not NULL/NULL — the sum-over-zero-rows trap), matching the
    unique rules' arithmetic."""
    from maps_spark.operators.expectations import expectation_report
    df = spark.createDataFrame([], "id long, name string")
    rep = {r.rule_id: (r.n_rows, r.n_violations, r.passed)
           for r in expectation_report(
               df, conditions={"c": "name IS NOT NULL"},
               unique={"u": ["id"]}).collect()}
    assert rep["c"] == (0, 0, True)
    assert rep["u"] == (0, 0, True)


def test_expectation_rule_id_with_quote(spark):
    """Rule ids are interpolated into the stack() SQL as string
    literals — a rule id containing a single quote must survive
    (escaped), not break the query (ADVICE r7)."""
    from maps_spark.operators.expectations import expectation_report
    df = spark.createDataFrame([(1,), (None,)], "doc_id int")
    rows = {r.rule_id: r.n_violations
            for r in expectation_report(
                df, {"o'brien's rule": "doc_id IS NOT NULL"}).collect()}
    assert rows == {"o'brien's rule": 1}


def test_snapshot_drift_planted(spark):
    """Closed-form drift: row-count and null-rate drift computed as
    exact permille, schema drift (added/removed column) always
    flagged, within-tolerance metrics pass."""
    from maps_spark.operators.expectations import (column_stats,
                                                   snapshot_drift)
    old = spark.createDataFrame(
        [(i, "s", "t") for i in range(100)],
        "doc_id int, source string, text string")
    new = spark.createDataFrame(
        [(i, "s", None if i < 30 else "t", 1.0) for i in range(90)],
        "doc_id int, source string, text string, score double")
    got = {(r["column"], r.metric): r for r in snapshot_drift(
        column_stats(old), column_stats(new),
        tol_permille=150).collect()}
    r = got[("doc_id", "n_rows")]
    assert (r.old_value, r.new_value, r.drift_permille,
            r.flagged) == (100, 90, 100, False)  # 10% < 15% tol
    r = got[("text", "n_null")]
    assert (r.old_value, r.new_value, r.drift_permille,
            r.flagged) == (0, 30, 30000, True)
    r = got[("score", "n_rows")]  # added column: schema drift
    assert r.old_value == -1 and r.flagged
    assert got[("source", "n_distinct")].flagged is False


def test_fetch_timeline_spacing(spark):
    """Politeness timeline: a host's URLs space max(crawl_delay,
    default_gap) apart in host_rank order, and retry backoff defers
    a URL past its slot."""
    from maps_spark.operators.crawl import fetch_timeline
    plan = spark.createDataFrame(
        [("u1", "a.x", 1, 0, 5), ("u2", "a.x", 2, 0, 5),
         ("u3", "a.x", 3, 600, 5),   # backoff dominates slot 10
         ("u4", "b.x", 1, 0, 0),     # no crawl delay -> default gap
         ("u5", "b.x", 2, 0, 0)],
        "norm_href string, domain string, host_rank long, "
        "next_delay_s long, crawl_delay_s long")
    got = {r.norm_href: (r.gap_s, r.scheduled_offset_s)
           for r in fetch_timeline(plan, default_gap_s=1).collect()}
    assert got == {"u1": (5, 0), "u2": (5, 5), "u3": (5, 600),
                   "u4": (1, 0), "u5": (1, 1)}


def test_column_stats_single_scan_plan(spark):
    """A profile over N columns (null counts + N distinct aggregates)
    still reads the input ONCE — Spark plans the multi-distinct
    aggregate as a single scan + expand, not a scan per column."""
    from maps_spark.operators.expectations import column_stats
    from tests.conftest import SF_SMALL
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    prof = column_stats(docs, ["doc_id", "source", "text"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    # and the profile agrees with per-column queries
    import pyspark.sql.functions as F
    want_distinct = docs.select(F.count_distinct("source")).first()[0]
    got = {r["column"]: r for r in prof.collect()}
    assert got["source"]["n_distinct"] == want_distinct
    assert got["doc_id"]["n_null"] == 0


def test_column_stats_approx_mode_no_expand(spark):
    """approx=True is the 100 TB path: HLL approx_count_distinct
    keeps the plain partial-aggregate shape — NO Expand operator
    (the exact multi-distinct plan expands one row per profiled
    column per input row) — and lands within a few rsd of exact."""
    from maps_spark.operators.expectations import column_stats
    from tests.conftest import SF_SMALL
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    cols = ["doc_id", "source", "lang"]
    exact = column_stats(docs, cols)
    approx = column_stats(docs, cols, approx=True, rsd=0.02)
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan     # the cost approx avoids
    assert "Expand" not in approx_plan
    assert approx_plan.count("Scan parquet") == 1
    e = {r["column"]: r["n_distinct"] for r in exact.collect()}
    a = {r["column"]: r["n_distinct"] for r in approx.collect()}
    for c in cols:
        assert abs(a[c] - e[c]) <= max(3, 0.06 * e[c]), (c, a[c], e[c])
    # null counts stay exact in both modes
    ae = {r["column"]: r["n_null"] for r in approx.collect()}
    ee = {r["column"]: r["n_null"] for r in exact.collect()}
    assert ae == ee


def test_numeric_stats_planted(spark):
    """Exact range profile + drift over it: a value shift that keeps
    row/null/distinct counts IDENTICAL is invisible to column_stats
    but flagged by the numeric metrics."""
    from maps_spark.operators.expectations import (column_stats,
                                                   numeric_stats,
                                                   snapshot_drift)
    old = spark.createDataFrame([(i, i * 2) for i in range(10)],
                                "a long, b long")
    new = spark.createDataFrame([(i, i * 2 + 500) for i in range(10)],
                                "a long, b long")  # b shifted +500
    ns = {r["column"]: r for r in numeric_stats(old, ["a", "b"])
          .collect()}
    assert (ns["b"].n_rows, ns["b"].sum_v, ns["b"].min_v,
            ns["b"].max_v) == (10, 90, 0, 18)
    mets = ("n_rows", "sum_v", "min_v", "max_v")
    drift = {(r["column"], r.metric): r for r in snapshot_drift(
        numeric_stats(old, ["a", "b"]), numeric_stats(new, ["a", "b"]),
        tol_permille=100, metrics=mets).collect()}
    assert drift[("b", "sum_v")].flagged      # 90 -> 5090
    assert not drift[("a", "sum_v")].flagged  # unchanged
    assert not drift[("b", "n_rows")].flagged
    # the count-based profile sees NOTHING (same rows, nulls,
    # distinct count) — the blind spot numeric_stats exists for
    cdrift = snapshot_drift(column_stats(old, ["a", "b"]),
                            column_stats(new, ["a", "b"]),
                            tol_permille=100)
    assert cdrift.where("flagged").count() == 0
