"""Crawl-protocol operator tests (operators/crawl.py): robots.txt /
sitemap parsing, redirect resolution, fetch retry scheduling —
planted closed-form cases plus composition properties against the
structured-rules twins."""

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL


def _docs(spark, n=60):
    return (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .where(F.col("doc_id") < n))


def test_robots_txt_roundtrip_matches_structured_rules(spark):
    """parse_robots_txt over the synthesized text bodies yields
    EXACTLY the structured rules table synthesize_robots builds —
    the text pipeline and the rules pipeline can never drift. The
    parser must skip Allow:/Crawl-delay:/comment lines and reject
    the empty Disallow."""
    from maps_spark.operators.crawl import (parse_robots_txt,
                                            synthesize_robots_txt)
    from maps_spark.operators.html import synthesize_robots
    docs = _docs(spark)
    got = {tuple(r) for r in
           parse_robots_txt(synthesize_robots_txt(docs)).collect()}
    want = {tuple(r) for r in synthesize_robots(docs).collect()}
    assert got == want and len(got) > 0


def test_parse_robots_txt_planted(spark):
    from maps_spark.operators.crawl import parse_robots_txt
    body = ("User-agent: *\r\n"      # \r tolerated via \S
            "Disallow: /private\n"
            "disallow: /case\n"      # wrong case: not a Disallow line
            "Disallow:\n"            # empty: allow-all, ignored
            "Disallow: /private\n"   # duplicate: deduped
            "Allow: /public\n"
            "# Disallow: /comment\n"
            "Disallow: /tmp/")
    df = spark.createDataFrame([("a.example", body)],
                               "domain string, body string")
    got = {r.disallow for r in parse_robots_txt(df).collect()}
    assert got == {"/private", "/tmp/"}


def test_sitemap_ghosts_are_the_uncrawled_gap(spark):
    """Composition: sitemap locs minus the crawled URL set is exactly
    the ghost entries (doc_id + 1e6) the synthesizer announces — the
    discovery feed a crawler merges into its frontier."""
    from maps_spark.operators.crawl import (parse_sitemaps,
                                            synthesize_sitemaps)
    from maps_spark.operators.html import page_urls, synthesize_html
    docs = _docs(spark)
    entries = parse_sitemaps(synthesize_sitemaps(docs))
    crawled = page_urls(synthesize_html(docs)) \
        .withColumnRenamed("norm_href", "loc")
    gap = {r.loc for r in
           entries.join(crawled, "loc", "left_anti").collect()}
    want = {f"http://{r.source}/doc/{r.doc_id + 1_000_000}"
            for r in docs.where(F.col("doc_id") % 7 == 0)
            .select("doc_id", "source").collect()}
    assert gap == want and len(gap) > 0
    # lastmod pairing survived optional fields: every third doc has
    # one, in document order
    by_dom = entries.where(F.col("lastmod") != "").count()
    assert by_dom == docs.where(F.col("doc_id") % 3 == 0).count()


def test_resolve_redirects_planted(spark):
    """Closed-form chains: a 3-hop chain resolves at its end, a
    2-cycle hits the hop cap unresolved, a 1-hop edge resolves
    immediately."""
    from maps_spark.operators.crawl import resolve_redirects
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),   # chain a->b->c->d
         ("x", "y"), ("y", "x"),               # 2-cycle
         ("solo", "end")],
        "src_url string, dst_url string")
    got = {r.src_url: (r.final_url, r.hops, r.resolved)
           for r in resolve_redirects(edges, max_hops=4).collect()}
    assert got["a"] == ("d", 3, True)
    assert got["b"] == ("d", 2, True)
    assert got["solo"] == ("end", 1, True)
    fx, hx, rx = got["x"]
    assert hx == 4 and rx is False and fx in ("x", "y")


def test_fetch_schedule_planted(spark):
    """Closed-form policy table: success -> done, permanent 404 ->
    drop, transient failures -> retry with doubled delay, budget
    exhaustion -> drop."""
    from maps_spark.operators.crawl import fetch_schedule
    log = spark.createDataFrame(
        [("ok", 0, 503), ("ok", 1, 200),        # recovered -> done
         ("gone", 0, 404),                      # permanent -> drop
         ("flaky", 0, 503),                     # 1 transient -> retry
         ("flaky2", 0, 503), ("flaky2", 1, 500),  # 2 transient -> retry
         ("dead", 0, 503), ("dead", 1, 503), ("dead", 2, 503)],
        "url string, attempt long, status long")
    got = {r.url: (r.action, r.next_delay_s, r.n_failures)
           for r in fetch_schedule(log, base_delay_s=60,
                                   max_retries=3).collect()}
    assert got["ok"] == ("done", 0, 1)
    assert got["gone"] == ("drop", 0, 1)
    assert got["flaky"] == ("retry", 120, 1)
    assert got["flaky2"] == ("retry", 240, 2)
    assert got["dead"] == ("drop", 0, 3)   # budget exhausted


def test_crawl_protocol_plan_shapes(spark):
    """Scale audits: both parsers are pure per-row codegen (no
    exchange, no Python UDF); redirect resolution has no cartesian
    and stays one checkpointed hop deep."""
    from maps_spark.operators.crawl import (parse_robots_txt,
                                            parse_sitemaps,
                                            resolve_redirects,
                                            synthesize_redirects,
                                            synthesize_robots_txt,
                                            synthesize_sitemaps)
    docs = _docs(spark)
    rb = parse_robots_txt(synthesize_robots_txt(docs))
    p = rb._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    # robots synthesis aggregates distinct sources; the PARSE stage
    # itself is codegen — no Python anywhere
    for udf in ("BatchEvalPython", "ArrowEvalPython"):
        assert udf not in p
    sm = parse_sitemaps(synthesize_sitemaps(docs))
    p2 = sm._jdf.queryExecution().executedPlan().toString()
    for udf in ("BatchEvalPython", "ArrowEvalPython"):
        assert udf not in p2
    rr = resolve_redirects(synthesize_redirects(docs))
    p3 = rr._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p3
    # checkpoint-per-hop: the final plan joins scan the checkpointed
    # edge RDD, not a re-derived lineage
    assert "Scan ExistingRDD" in p3


def test_frontier_with_sitemaps_merge(spark):
    """Discovery merge semantics: a sitemap ghost arrives as a
    zero-ref 'sitemap' candidate with its domain's link-graph rank
    (or 0 when unlinked), a link-discovered URL stays 'links' with
    its counts, and a URL found both ways is 'both' — planted via a
    sitemap that also announces a link-discovered next-digest URL."""
    import pyspark.sql.functions as F

    from maps_spark.operators.crawl import (frontier_with_sitemaps,
                                            synthesize_sitemaps)
    from maps_spark.operators.html import (frontier_candidates,
                                           synthesize_html)
    docs = _docs(spark, n=30)
    pages = synthesize_html(docs)
    base = frontier_candidates(pages)
    some_link = base.orderBy("norm_href").first()
    extra = spark.createDataFrame(
        [("x.example",
          f"<?xml version=\"1.0\"?><urlset><url><loc>"
          f"{some_link.norm_href}</loc></url></urlset>")],
        "domain string, xml string")
    sitemaps = synthesize_sitemaps(docs).unionByName(extra)
    got = frontier_with_sitemaps(pages, sitemaps)
    by_via = {r["via"]: r["cnt"] for r in
              got.groupBy("via").agg(F.count("*").alias("cnt"))
              .collect()}
    assert by_via.get("both") == 1
    assert by_via.get("sitemap", 0) > 0  # the ghosts
    assert by_via.get("links", 0) == base.count() - 1
    # the 'both' row keeps its link-side counts and rank
    b = got.where(F.col("via") == "both").first()
    assert (b.n_refs, b.n_ref_docs, b.domain_rank) == \
        (some_link.n_refs, some_link.n_ref_docs, some_link.domain_rank)
    # every sitemap-only row has zero refs and a rank consistent with
    # the link graph (its domain's rank, or 0 when unlinked)
    sm = got.where(F.col("via") == "sitemap")
    assert sm.where((F.col("n_refs") != 0) |
                    (F.col("n_ref_docs") != 0)).count() == 0
    ranks = {r.domain: r.domain_rank for r in
             base.select("domain", "domain_rank").distinct().collect()}
    for r in sm.collect():
        assert r.domain_rank == ranks.get(r.domain, 0)


def test_sitemap_only_rows_rank_from_graph_not_candidates(spark):
    """Regression (round-7 second review): a ranked domain whose
    link-discovered URLs are ALL crawled never appears among the
    frontier candidates — its sitemap announcements must still carry
    its link-graph rank, not 0."""
    import pyspark.sql.functions as F

    from maps_spark.operators.crawl import frontier_with_sitemaps
    from maps_spark.operators.graph import pagerank
    from maps_spark.operators.html import site_domain_edges

    # two pages on a.example both link to b.example's only page,
    # which is ALREADY crawled (it is page 2's own URL) -> b.example
    # is ranked in the site->domain graph but yields no candidates
    pages = spark.createDataFrame(
        [(1, "a.example",
          '<html><body><p>' + 'w ' * 40 + '</p>'
          '<a href="http://b.example/doc/2">b</a></body></html>'),
         (2, "b.example",
          "<html><body><p>" + "x " * 40 + "</p></body></html>")],
        "doc_id long, source string, html string")
    sitemaps = spark.createDataFrame(
        [("b.example",
          '<?xml version="1.0"?><urlset><url><loc>'
          "http://b.example/doc/999</loc></url></urlset>")],
        "domain string, xml string")
    got = {r.norm_href: r for r in
           frontier_with_sitemaps(pages, sitemaps).collect()}
    row = got["http://b.example/doc/999"]
    ranks = {r.node: r.rank_scaled
             for r in pagerank(site_domain_edges(pages)).collect()}
    assert row.via == "sitemap" and row.n_refs == 0
    assert ranks["b.example"] > 0
    assert row.domain_rank == ranks["b.example"], \
        "announced URL lost its ranked domain's score"


def test_robots_v2_rfc_precedence_planted(spark):
    """RFC 9309 resolution on planted rules: longest match wins,
    an equal-length Allow beats a Disallow, unmatched URLs pass,
    and rule domains case-fold onto the URL's domain."""
    from maps_spark.operators.crawl import (parse_robots_v2,
                                            robots_decisions_v2,
                                            url_paths)
    body = ("User-agent: *\n"
            "Disallow: /t/\n"
            "Allow: /t/news\n"
            "Disallow: /t/news\n"
            "Allow: /buy\n"
            "Disallow: /buy/checkout\n"
            "Crawl-delay: 3\n")
    rules = parse_robots_v2(spark.createDataFrame(
        [("A.example", body)], "domain string, body string"))
    cand = spark.createDataFrame(
        [(f"http://a.example{p}",) for p in
         ("/t/x", "/t/news/1", "/buy/item", "/buy/checkout/2",
          "/other")], "norm_href string")
    got = {r.url: (r.match_path, r.match_type, r.blocked)
           for r in robots_decisions_v2(url_paths(cand),
                                        rules).collect()}
    assert got["http://a.example/t/x"] == ("/t/", "disallow", True)
    assert got["http://a.example/t/news/1"] == \
        ("/t/news", "allow", False)      # equal length: allow wins
    assert got["http://a.example/buy/item"] == \
        ("/buy", "allow", False)
    assert got["http://a.example/buy/checkout/2"] == \
        ("/buy/checkout", "disallow", True)  # longer disallow wins
    assert got["http://a.example/other"] == ("", "", False)


def test_robots_crawl_delay_extraction(spark):
    from maps_spark.operators.crawl import robots_crawl_delay
    df = spark.createDataFrame(
        [("a.example", "Crawl-delay: 2\nDisallow: /x\nCrawl-delay: 9\n"),
         ("b.example", "Disallow: /y\n")],
        "domain string, body string")
    got = {r.domain: r.crawl_delay_s
           for r in robots_crawl_delay(df).collect()}
    assert got == {"a.example": 9}  # max wins; no-delay domain absent


def test_recrawl_candidates_planted(spark):
    """Only announced URLs with a lastmod NEWER than their last fetch
    recrawl; the newest lastmod wins across sitemaps; never-fetched
    (ghost) and lastmod-free entries are excluded."""
    from maps_spark.operators.crawl import recrawl_candidates
    sitemaps = spark.createDataFrame(
        [("a.example",
          '<?xml version="1.0"?><urlset>'
          "<url><loc>http://a.example/p/1</loc>"
          "<lastmod>2026-01-10</lastmod></url>"
          "<url><loc>http://a.example/p/2</loc>"
          "<lastmod>2026-03-01</lastmod></url>"
          "<url><loc>http://a.example/p/3</loc></url>"
          "<url><loc>http://a.example/ghost</loc>"
          "<lastmod>2026-12-31</lastmod></url></urlset>"),
         ("m.example",
          '<?xml version="1.0"?><urlset>'
          "<url><loc>http://a.example/p/2</loc>"
          "<lastmod>2026-02-01</lastmod></url></urlset>")],
        "domain string, xml string")
    fetched = spark.createDataFrame(
        [("http://a.example/p/1", "2026-02-01"),
         ("http://a.example/p/2", "2026-02-15"),
         ("http://a.example/p/3", "2026-01-01")],
        "norm_href string, fetched_at string")
    got = {r.norm_href: (r.lastmod, r.fetched_at)
           for r in recrawl_candidates(sitemaps, fetched).collect()}
    # p/1 fresh (01-10 < 02-01); p/2 stale on the NEWEST lastmod
    # (03-01 > 02-15, even though m.example's 02-01 is older);
    # p/3 no lastmod; ghost never fetched
    assert got == {"http://a.example/p/2":
                   ("2026-03-01", "2026-02-15")}


def test_robots_v2_rules_broadcast_guard(spark, monkeypatch):
    """The v2 rules join broadcasts only below BROADCAST_MAX_ROWS;
    above it (patched to 0) the same equi-join runs as a shuffle
    join — the size-guard contract every broadcast in the crawl
    family honors."""
    from maps_spark.operators import html as H
    from maps_spark.operators.crawl import (parse_robots_v2,
                                            robots_decisions_v2,
                                            synthesize_robots_v2,
                                            synthesize_v2_urls)
    docs = _docs(spark)
    rules = parse_robots_v2(synthesize_robots_v2(docs))
    urls = synthesize_v2_urls(docs)

    def plan():
        df = robots_decisions_v2(urls, rules)
        return df._jdf.queryExecution().executedPlan().toString()

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert "BroadcastExchange" in plan(), \
            "small rules table should broadcast"
        monkeypatch.setattr(H, "BROADCAST_MAX_ROWS", 0)
        assert "BroadcastExchange" not in plan(), \
            "above-threshold rules must fall back to a shuffle join"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
