"""End-to-end raw-web corpus driver tests (plans/web.py)."""

import os

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL


def _pages(spark, n=40):
    from maps_spark.operators.html import synthesize_html
    docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .where(F.col("doc_id") < n))
    return synthesize_html(docs).select("doc_id", "source", "html")


def test_run_web_corpus_planted_drops(spark, tmp_path):
    """Each funnel stage demonstrably drops its planted page: a
    boilerplate-only page at extract, a benchmark twin at
    decontamination, a duplicated page at dedup — and nothing else
    goes missing (quality disabled to keep the plant arithmetic
    exact)."""
    from maps_spark.plans.web import read_web_shards, run_web_corpus
    pages = _pages(spark).cache()
    base_ids = {r.doc_id for r in pages.select("doc_id").collect()}
    # plant 1: boilerplate-only page -> dropped at extract
    thin = ('<html><body><nav><a href="/">home</a> '
            '<a href="/a">about page</a></nav>'
            '<footer><a href="/t">terms</a></footer></body></html>')
    # plant 2: byte-duplicate of doc 0's page under a higher id
    dup = (pages.where(F.col("doc_id") == 0)
           .select(F.lit(9002).alias("doc_id"), "source", "html"))
    planted = pages.unionByName(
        spark.createDataFrame([(9001, "srcX", thin)],
                              "doc_id long, source string, html string")
    ).unionByName(dup)
    # plant 3: benchmark = doc 1's exact text -> doc 1 contaminated
    bench = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
             .where(F.col("doc_id") == 1).select("doc_id", "text"))

    root = str(tmp_path / "web")
    m = run_web_corpus(spark, SF_SMALL, root, pages=planted,
                       benchmark=bench, quality_min_scaled=0,
                       n_shards=4, seq_budget=128)
    f = m["funnel"]
    assert f["pages_in"] == len(base_ids) + 2
    # thin plant gone (plus any genuinely short real docs)
    assert f["extracted"] < f["pages_in"]
    assert f["quality"] == f["extracted"]  # threshold 0
    # decontamination drops at least doc 1 (shared shingles may take
    # a handful of near-twins with it at this tiny SF)
    assert f["decontaminated"] < f["quality"]
    assert f["deduped"] < f["decontaminated"]  # the planted dup
    assert f["sampled"] == f["deduped"] and f["sequences"] > 0

    back = read_web_shards(spark, root)
    got_ids = {r.doc_id for r in back.select("doc_id").collect()}
    assert back.count() == f["sampled"]
    assert 9001 not in got_ids, "thin page leaked through extract"
    assert 1 not in got_ids, "contaminated doc leaked"
    assert not {0, 9002} <= got_ids, "exact dup pair both kept"
    assert 0 in got_ids, "canonical (lowest id) not the keeper"
    # shard text is the NORMALIZED extraction of the original text
    r0 = back.where(F.col("doc_id") == 0).collect()[0]
    raw0 = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .where(F.col("doc_id") == 0).collect()[0].text)
    assert set(r0.text.split(" ")) <= set(raw0.split(" ") + [""])
    assert "<" not in r0.text and "copyright" not in r0.text
    pages.unpersist()


def test_web_corpus_quality_threshold_and_rotation(spark, tmp_path):
    """The quality stage actually filters when enabled, stages stay
    monotonic without a benchmark, and versioned builds rotate
    keep-2 like every other store."""
    from maps_spark.plans.web import run_web_corpus
    root = str(tmp_path / "web2")
    m = run_web_corpus(spark, SF_SMALL, root, pages=_pages(spark),
                       quality_min_scaled=500_000, n_shards=2,
                       seq_budget=128)
    f = m["funnel"]
    assert 0 < f["quality"] < f["extracted"]
    assert f["decontaminated"] == f["quality"]  # no benchmark
    assert f["deduped"] <= f["quality"] and f["sampled"] == f["deduped"]
    m2 = run_web_corpus(spark, SF_SMALL, root, pages=_pages(spark),
                        quality_min_scaled=500_000, n_shards=2,
                        seq_budget=128)
    builds = sorted(os.listdir(f"{root}/builds"))
    assert len(builds) <= 2 and m2["build_id"] == builds[-1]


def test_streaming_store_feeds_batch_driver(spark, tmp_path):
    """Composition: the streaming ingest store is a valid input for
    the batch curation stack — already-extracted docs flow through
    quality/dedup/pack without re-parsing HTML, and the funnel
    matches running the batch driver over the same raw pages."""
    import pyspark.sql.functions as F

    from maps_spark.operators.corpus import curate_corpus
    from maps_spark.streaming.web import read_web_store, run_web_ingest
    pages = _pages(spark, 50)
    land = str(tmp_path / "land")
    pages.repartition(2).write.parquet(land)
    store = str(tmp_path / "store")
    q = run_web_ingest(spark, land, store, max_files_per_trigger=1)
    q.awaitTermination(300)
    curated = read_web_store(spark, store)
    verdicts = curate_corpus(curated.select("doc_id", "text", "source"))
    kept = verdicts.where(F.col("stage") == "kept").count()
    assert 0 < kept <= curated.count() <= 50


def test_streaming_frontier_matches_batch_twin(spark, tmp_path):
    """After draining a multi-batch backlog, the merge-on-read
    frontier equals frontier_candidates over all landed pages row
    for row — including retraction (URLs crawled by a later batch
    leave the frontier) — and a restart replays nothing (marker
    guard), leaving the store unchanged."""
    from maps_spark.operators.html import frontier_candidates
    from maps_spark.streaming.frontier import (read_frontier,
                                               run_frontier_ingest)
    # one shared site so next-digest links (/doc/<id+1>) collide with
    # later-crawled pages' own URLs — the retraction case
    pages = _pages(spark, 30).withColumn("source", F.lit("one.site"))
    land = str(tmp_path / "land")
    pages.repartition(3).write.parquet(land)
    store = str(tmp_path / "store")
    q = run_frontier_ingest(spark, land, store, max_files_per_trigger=1)
    q.awaitTermination(300)

    got = {tuple(r) for r in read_frontier(spark, store).collect()}
    want = {tuple(r) for r in frontier_candidates(pages).collect()}
    assert got == want and len(got) > 0
    # retraction really happened: the refs store holds references to
    # crawled URLs (cross-batch), and none of them reach the frontier
    refs = {r.norm_href
            for r in spark.read.parquet(f"{store}/refs").collect()}
    seen = {r.norm_href
            for r in spark.read.parquet(f"{store}/seen").collect()}
    retracted = refs & seen
    assert retracted and not (retracted & {t[0] for t in got})

    q2 = run_frontier_ingest(spark, land, store,
                             max_files_per_trigger=1)
    q2.awaitTermination(300)
    again = {tuple(r) for r in read_frontier(spark, store).collect()}
    assert again == want


def test_run_crawl_plan_e2e(spark, tmp_path):
    """The scheduling driver composes frontier -> robots -> shards
    with a monotone funnel, writes shard-partitioned fetch plans a
    worker can read partition-pruned, and rotates versioned builds
    keep-2."""
    from maps_spark.operators.html import synthesize_robots
    from maps_spark.plans.crawl import read_fetch_plan, run_crawl_plan
    pages = _pages(spark, 30)
    root = str(tmp_path / "crawl")
    rules = synthesize_robots(pages)
    m = run_crawl_plan(spark, pages, root, rules=rules,
                       per_host_cap=3, n_shards=4)
    f = m["funnel"]
    assert 0 < f["allowed"] < f["candidates"]  # robots really filtered
    assert 0 < f["planned"] <= f["allowed"]
    assert f["hosts"] > 0
    plan = read_fetch_plan(spark, root)
    assert plan.count() == f["planned"]
    # politeness: every host rides exactly one shard, cap respected
    per_host = plan.groupBy("domain").agg(
        F.countDistinct("shard").alias("ns"),
        F.count("*").alias("n")).collect()
    assert all(r.ns == 1 and r.n <= 3 for r in per_host)
    # a single-shard read sees only its own hosts
    s0 = read_fetch_plan(spark, root, shard=0)
    assert s0.count() == plan.where(F.col("shard") == 0).count()
    # keep-2 rotation
    import time as _t
    _t.sleep(1.1)
    run_crawl_plan(spark, pages, root, rules=rules,
                   per_host_cap=3, n_shards=4)
    _t.sleep(1.1)
    m3 = run_crawl_plan(spark, pages, root, rules=rules,
                        per_host_cap=3, n_shards=4)
    builds = sorted(os.listdir(f"{root}/builds"))
    assert len(builds) <= 2 and m3["build_id"] == builds[-1]


def test_web_corpus_site_template_stage(spark, tmp_path):
    """With site_template=True a long link-free blurb planted on
    every page of every site (which the per-page rule keeps) is gone
    from the shards; without it, it survives — the cross-document
    pass is really wired into the driver."""
    from maps_spark.plans.web import read_web_shards, run_web_corpus
    blurb = ("about us we are a family business serving the finest "
             "boilerplate since nineteen ninety nine every day")
    # one shared site: the template pass needs >= min_pages pages per
    # site to call a block template (single-page sites keep theirs)
    pages = (_pages(spark, 30)
             .withColumn("source", F.lit("one.site"))
             .withColumn("html",
                         F.concat("html", F.lit(f"<p>{blurb}</p>"))))
    r1 = str(tmp_path / "with")
    m1 = run_web_corpus(spark, SF_SMALL, r1, pages=pages,
                        quality_min_scaled=0, n_shards=2,
                        seq_budget=128, site_template=True)
    assert m1["site_template"] is True
    texts = [r.text for r in read_web_shards(spark, r1).collect()]
    assert texts and all("family business" not in t for t in texts)

    r2 = str(tmp_path / "without")
    run_web_corpus(spark, SF_SMALL, r2, pages=pages,
                   quality_min_scaled=0, n_shards=2, seq_budget=128)
    texts2 = [r.text for r in read_web_shards(spark, r2).collect()]
    assert any("family business" in t for t in texts2)


def test_random_walks_contracts(spark):
    """DeepWalk corpus generation: every consecutive (node, next)
    is a real edge, dead ends stop walks early, every start emits
    walks_per_node walks, picks are deterministic across runs."""
    from maps_spark.operators.graph import random_walks
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (4, 5)],  # 5 is a dead end
        "src long, dst long")
    out = random_walks(edges, walk_len=4, walks_per_node=3).collect()
    eset = {(1, 2), (1, 3), (2, 3), (3, 1), (4, 5)}
    walks = {}
    for r in out:
        walks.setdefault((r.start, r.walk), {})[r.step] = r.node
    # every start node with out-edges launches all 3 walks
    assert {s for s, _ in walks} == {1, 2, 3, 4}
    assert all(sum(1 for k in walks if k[0] == s) == 3
               for s in (1, 2, 3, 4))
    for (s, _w), steps in walks.items():
        assert steps[0] == s
        seq = [steps[i] for i in sorted(steps)]
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in eset, (seq,)
        # walks from 4 reach the dead end 5 and stop there
        if s == 4:
            assert seq == [4, 5]
        else:
            assert len(seq) == 4  # the cycle component never ends
    again = random_walks(edges, walk_len=4, walks_per_node=3).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in out}


def test_random_walks_diverge_after_collision(spark):
    """Corpus diversity: two walks (different starts) that land on
    the same node at the same offset must not share their whole
    suffix — the pick seed is nonlinear in (start, node), so a
    collision does not collapse the walks (an affine seed would:
    a constant start offset shifts every pick identically)."""
    from maps_spark.operators.graph import random_walks
    nodes = [1, 2, 3, 4]
    edges = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a != b],
        "src long, dst long")
    out = random_walks(edges, walk_len=6, walks_per_node=2).collect()
    seqs = {}
    for r in out:
        seqs.setdefault((r.start, r.walk), {})[r.step] = r.node
    seqs = {k: [v[i] for i in sorted(v)] for k, v in seqs.items()}
    # all 8 walks distinct, and most same-node collisions diverge
    assert len(set(map(tuple, seqs.values()))) == len(seqs) == 8
    coll = div = 0
    ks = sorted(seqs)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            a, b = seqs[ks[i]], seqs[ks[j]]
            for t in range(min(len(a), len(b)) - 1):
                if a[t] == b[t]:
                    coll += 1
                    div += a[t + 1] != b[t + 1]
    assert coll > 0 and div / coll > 0.5, (coll, div)


def test_skipgram_pairs_window_and_multiplicity(spark):
    """A single known walk yields exactly the within-window ordered
    pairs; cross-walk pairs never form."""
    from maps_spark.operators.graph import skipgram_pairs
    rows = [(1, 0, s, n) for s, n in enumerate([1, 2, 3, 1])] \
        + [(9, 0, s, n) for s, n in enumerate([7, 8])]
    walks = spark.createDataFrame(
        rows, "start long, walk int, step int, node long")
    out = [(r.center, r.context, r.dist)
           for r in skipgram_pairs(walks, window=2).collect()]
    from collections import Counter
    got = Counter(out)
    want = Counter()
    seqs = [[1, 2, 3, 1], [7, 8]]
    for seq in seqs:
        for i, c in enumerate(seq):
            for j, x in enumerate(seq):
                if 1 <= abs(i - j) <= 2:
                    want[(c, x, abs(i - j))] += 1
    assert got == want
    assert not any((a in (7, 8)) != (b in (7, 8)) for a, b, _ in got)


def test_node2vec_bias_and_validity(spark):
    """Second-order semantics: with a huge return weight nearly
    every step>=2 transition goes back to the previous node; with
    default weights walks stay on real edges and are deterministic."""
    import pyspark.sql.functions as F

    from maps_spark.operators.graph import node2vec_walks
    # K4: every node adjacent to every other
    nodes = [1, 2, 3, 4]
    e = [(a, b) for a in nodes for b in nodes if a != b]
    edges = spark.createDataFrame(e, "src long, dst long")
    out = node2vec_walks(edges, walk_len=4, walks_per_node=4,
                         wp=1_000_000, w1=1, wq=1).collect()
    seqs = {}
    for r in out:
        seqs.setdefault((r.start, r.walk), {})[r.step] = r.node
    returns = total = 0
    for steps in seqs.values():
        seq = [steps[i] for i in sorted(steps)]
        assert len(seq) == 4
        for a, b in zip(seq, seq[1:]):
            assert (a, b) in set(e)
        for i in range(2, len(seq)):
            total += 1
            returns += seq[i] == seq[i - 2]
    assert returns / total > 0.9  # the mixer sliver allows rare misses
    # determinism with default weights
    d1 = {tuple(r) for r in node2vec_walks(
        edges, walk_len=4, walks_per_node=2).collect()}
    d2 = {tuple(r) for r in node2vec_walks(
        edges, walk_len=4, walks_per_node=2).collect()}
    assert d1 == d2 and len(d1) == 4 * 2 * 4
