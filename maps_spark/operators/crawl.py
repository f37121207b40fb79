"""Crawl-protocol operators: robots.txt parsing, sitemap parsing,
redirect-chain resolution, and fetch retry scheduling.

These complete the crawl family around the frontier machinery in
:mod:`maps_spark.operators.html`: a real crawler does not receive
structured (domain, disallow) rules or a clean URL list — it fetches
``robots.txt`` and ``sitemap.xml`` bodies and an HTTP status per
attempt, and the scheduler derives everything else. The reference
(gbif/maps) has no crawl pipeline (it ingests structured occurrence
rows — declared new scope); semantics follow the PUBLIC specs:
robots.txt (the original 1994 REP convention: ``Disallow:`` path
prefixes per domain), sitemaps.org XML (``<url><loc/><lastmod/>``
entries), and standard truncated-exponential-backoff retry policy.

Engineering rules (shared with the DuckDB oracle twins, same regex
discipline as :mod:`operators.html`):

- every regex parses identically under Java regex and RE2 (no
  lookahead/backreferences; ``(?m)``/``(?s)`` flags only);
- redirect resolution unrolls a FIXED hop count (``max_hops``) so the
  oracle is an unrolled CTE chain and the Spark plan is ``max_hops``
  checkpointed self-joins — never a recursive driver loop over
  ``collect()``;
- backoff delays are exact integers (``base << n`` capped), so the
  schedule gate hash-matches bitwise.

Scale shapes: robots/sitemap parsing is pure per-row codegen
(regexp_extract_all + array transforms, zero shuffles). Redirect
resolution shuffles once per hop on the chain key with the edge table
re-used each hop (checkpointed, so the plan stays one hop deep).
Fetch scheduling is one per-URL aggregation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# robots.txt
# ---------------------------------------------------------------------------

# One Disallow path per line, engine-identical BY CONSTRUCTION:
# no (?m) (Java's multiline ^ also fires after bare \r /   etc.,
# RE2's only after \n) and no \S (Java's excludes \x0B, RE2's does
# not) — start-of-input-or-\n plus an explicit negated class behave
# bit-identically in both engines on ANY input, which the hypothesis
# parity property exercises. The path class rejects the empty
# "Disallow:" (allow-all) form per the original REP convention.
ROBOTS_DISALLOW_RE = r"(?:^|\n)Disallow:[ \t]*([^ \t\r\n]+)"

_RT_SITE = ("User-agent: *\n# site policy\nDisallow: /buy\n"
            "Allow: /news\nDisallow: /t/\nCrawl-delay: 2\n")
_RT_PARTNER = "User-agent: *\nDisallow: /ref\nDisallow:\n"


def synthesize_robots_txt(pages: DataFrame, id_col: str = "doc_id",
                          source_col: str = "source") -> DataFrame:
    """Deterministic raw robots.txt bodies for the synthesized web —
    the text-form twin of :func:`operators.html.synthesize_robots`:
    every source site publishes the site policy body (/buy and /t/
    disallowed, plus Allow/Crawl-delay lines the parser must skip),
    every even-numbered partner domain the partner body (/ref
    disallowed plus an EMPTY Disallow line the parser must reject).

    Output: (domain, body)."""
    s = pages.select(F.col(source_col).alias("domain")).distinct()
    ks = (pages.select((F.col(id_col) % 7).alias("k")).distinct()
          .where(F.col("k") % 2 == 0))
    return (s.select("domain", F.lit(_RT_SITE).alias("body"))
            .unionByName(ks.select(
                F.concat(F.lit("partner"), F.col("k").cast("string"),
                         F.lit(".example")).alias("domain"),
                F.lit(_RT_PARTNER).alias("body"))))


def parse_robots_txt(robots: DataFrame, domain_col: str = "domain",
                     body_col: str = "body") -> DataFrame:
    """Raw robots.txt bodies -> the structured (domain, disallow)
    rules table :func:`operators.html.apply_robots` consumes. The
    original-REP subset: every non-empty ``Disallow:`` path prefix
    counts (agent groups are not distinguished — the conservative
    union a polite crawler applies when it only self-identifies as
    ``*``); ``Allow:`` / ``Crawl-delay:`` / comments are ignored.
    Pure codegen — one regexp_extract_all + explode per body."""
    return (robots.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.regexp_extract_all(
            F.col(body_col), F.lit(ROBOTS_DISALLOW_RE), F.lit(1)))
        .alias("disallow"))
        .distinct())


def _sql_str(s: str) -> str:
    """Python literal -> single-quoted SQL literal with newlines as
    chr(10) concats (works in both dialects)."""
    parts = s.split("\n")
    quoted = " || chr(10) || ".join("'" + p.replace("'", "''") + "'"
                                    for p in parts)
    return quoted


def robots_txt_ctes() -> str:
    """CTE ``robots_txt(domain, body)`` over ``documents`` —
    byte-identical to :func:`synthesize_robots_txt`."""
    return f"""robots_txt AS (
  SELECT domain, {_sql_str(_RT_SITE)} AS body
  FROM (SELECT DISTINCT source AS domain FROM documents)
  UNION ALL
  SELECT 'partner' || CAST(k AS VARCHAR) || '.example' AS domain,
         {_sql_str(_RT_PARTNER)} AS body
  FROM (SELECT DISTINCT doc_id % 7 AS k FROM documents)
  WHERE k % 2 = 0)"""


def robots_parse_select() -> str:
    """DuckDB twin of synthesize_robots_txt |> parse_robots_txt."""
    return f"""WITH {robots_txt_ctes()}
SELECT DISTINCT domain,
       unnest(regexp_extract_all(body, '{ROBOTS_DISALLOW_RE}', 1))
         AS disallow
FROM robots_txt"""


# ---------------------------------------------------------------------------
# robots.txt v2 — RFC 9309 precedence (longest match, Allow wins ties)
# ---------------------------------------------------------------------------

# Same engine-identical-by-construction discipline as
# ROBOTS_DISALLOW_RE: (?:^|\n) anchor + explicit negated class.
ROBOTS_ALLOW_RE = r"(?:^|\n)Allow:[ \t]*([^ \t\r\n]+)"
ROBOTS_DELAY_RE = r"(?:^|\n)Crawl-delay:[ \t]*([0-9]+)"

# v2 synthetic body: every RFC 9309 precedence case in one policy —
# a longer Allow beating a shorter Disallow (/t/news vs /t/), an
# equal-length tie Allow wins (/t/news both ways), a longer Disallow
# beating a shorter Allow (/buy/checkout vs /buy), plus a
# Crawl-delay the fetch plan must honor.
_RT_V2 = ("User-agent: *\n"
          "Disallow: /t/\n"
          "Allow: /t/news\n"
          "Disallow: /t/news\n"
          "Allow: /buy\n"
          "Disallow: /buy/checkout\n"
          "Crawl-delay: 3\n")


def synthesize_robots_v2(docs: DataFrame,
                         source_col: str = "source") -> DataFrame:
    """Every source site publishes the v2 precedence policy body.
    Output: (domain, body)."""
    return (docs.select(F.col(source_col).alias("domain")).distinct()
            .select("domain", F.lit(_RT_V2).alias("body")))


def parse_robots_v2(robots: DataFrame, domain_col: str = "domain",
                    body_col: str = "body") -> DataFrame:
    """Raw robots.txt bodies -> RFC 9309 rule rows: both ``Allow:``
    and ``Disallow:`` lines as (domain, rule_type, path). Empty-path
    lines are no-ops in the RFC and are rejected by the path class.
    Pure codegen — two regexp_extract_alls per body."""
    d = F.col(domain_col).alias("domain")

    def rules(rx: str, t: str):
        return (robots.select(
            d, F.lit(t).alias("rule_type"),
            F.explode(F.regexp_extract_all(
                F.col(body_col), F.lit(rx), F.lit(1))).alias("path")))

    return (rules(ROBOTS_ALLOW_RE, "allow")
            .unionByName(rules(ROBOTS_DISALLOW_RE, "disallow"))
            .distinct())


def robots_crawl_delay(robots: DataFrame, domain_col: str = "domain",
                       body_col: str = "body") -> DataFrame:
    """Per-domain ``Crawl-delay:`` seconds (the conservative MAX when
    a body repeats it). Output: (domain, crawl_delay_s)."""
    return (robots.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.regexp_extract_all(
            F.col(body_col), F.lit(ROBOTS_DELAY_RE), F.lit(1)))
        .alias("_d"))
        .groupBy("domain")
        .agg(F.max(F.col("_d").cast("long")).alias("crawl_delay_s")))


def robots_decisions_v2(urls: DataFrame,
                        rules: DataFrame) -> DataFrame:
    """RFC 9309 match decision per URL: among the URL's domain rules
    whose path is a prefix of the URL's path, the LONGEST match wins
    and an equal-length Allow beats a Disallow; no matching rule
    means allowed. ``urls`` needs (url, domain, path) — see
    :func:`url_paths`.

    Shape: one domain-keyed join against the (bounded, broadcast-
    when-small) rules table, one per-URL max-struct aggregation —
    the struct orders by (match length, allow-wins-tie), so the
    winner is picked without a window sort.

    Output: (url, domain, match_path, match_type, blocked)."""
    from maps_spark.operators.html import _broadcast_if_small
    r = rules.select(F.lower("domain").alias("_rd"),
                     "rule_type", F.col("path").alias("rpath"))
    # case-fold BOTH sides (the rules table above, the URL's domain
    # here) — robots host matching is case-insensitive
    m = (urls.join(_broadcast_if_small(r),
                   F.lower(urls["domain"]) == r["_rd"])
         .where(F.col("path").startswith(F.col("rpath")))
         .groupBy("url")
         .agg(F.max(F.struct(
             F.length("rpath").alias("l"),
             (F.col("rule_type") == "allow").cast("int").alias("a"),
             F.col("rpath").alias("p"))).alias("b")))
    return (urls.join(m, "url", "left")
            .select("url", "domain",
                    F.coalesce(F.col("b.p"), F.lit(""))
                    .alias("match_path"),
                    F.when(F.col("b").isNull(), "")
                    .when(F.col("b.a") == 1, "allow")
                    .otherwise("disallow").alias("match_type"),
                    F.coalesce(F.col("b.a") == 0, F.lit(False))
                    .alias("blocked")))


def url_paths(cand: DataFrame,
              url_col: str = "norm_href") -> DataFrame:
    """(url, domain, path) projection of a candidate table — the
    robots matcher's input shape ('' paths normalize to '/')."""
    from maps_spark.operators.html import _URL_PATH_STRIP, DOMAIN_RE
    path = F.regexp_replace(F.col(url_col), _URL_PATH_STRIP, "")
    return cand.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(F.col(url_col), DOMAIN_RE, 1).alias("domain"),
        F.when(path == "", "/").otherwise(path).alias("path"))


def apply_robots_v2(cand: DataFrame, rules: DataFrame) -> DataFrame:
    """Filter a frontier table by RFC 9309 rules: drop candidates
    whose winning match is a Disallow (longest match, Allow wins
    ties, unmatched passes)."""
    blocked = (robots_decisions_v2(url_paths(cand), rules)
               .where("blocked")
               .select(F.col("url").alias("norm_href")).distinct())
    return cand.join(blocked, "norm_href", "left_anti")


_V2_PATHS = ["/t/x", "/t/news/1", "/buy/item", "/buy/checkout/2",
             "/other"]


def synthesize_v2_urls(docs: DataFrame, id_col: str = "doc_id",
                       source_col: str = "source") -> DataFrame:
    """Deterministic candidate URLs hitting every precedence case:
    doc i requests path _V2_PATHS[i % 5] on its source site.
    Output: (url, domain, path)."""
    p = F.element_at(F.array(*[F.lit(x) for x in _V2_PATHS]),
                     (F.col(id_col) % 5 + 1).cast("int"))
    return (docs.select(
        F.concat(F.lit("http://"), F.col(source_col), p).alias("url"),
        F.col(source_col).alias("domain"), p.alias("path"))
        .distinct())


def robots_v2_select() -> str:
    """DuckDB twin of synthesize_robots_v2 + synthesize_v2_urls
    |> robots_decisions_v2."""
    paths = ", ".join(f"'{p}'" for p in _V2_PATHS)
    return f"""WITH bodies AS (
  SELECT domain, {_sql_str(_RT_V2)} AS body
  FROM (SELECT DISTINCT source AS domain FROM documents)),
rules AS (
  SELECT DISTINCT domain, 'allow' AS rule_type,
         unnest(regexp_extract_all(body, '{ROBOTS_ALLOW_RE}', 1))
           AS rpath
  FROM bodies
  UNION
  SELECT DISTINCT domain, 'disallow',
         unnest(regexp_extract_all(body, '{ROBOTS_DISALLOW_RE}', 1))
  FROM bodies),
urls AS (
  SELECT DISTINCT 'http://' || source || p AS url,
         source AS domain, p AS path
  FROM documents,
       LATERAL (SELECT ([{paths}])[(doc_id % 5) + 1] AS p) v),
m AS (
  SELECT u.url, r.rule_type, r.rpath,
         row_number() OVER (
           PARTITION BY u.url
           ORDER BY length(r.rpath) DESC,
                    CASE WHEN r.rule_type = 'allow' THEN 1 ELSE 0
                    END DESC) AS rn
  FROM urls u JOIN rules r ON r.domain = lower(u.domain)
  WHERE starts_with(u.path, r.rpath))
SELECT u.url, u.domain,
       COALESCE(m.rpath, '') AS match_path,
       COALESCE(m.rule_type, '') AS match_type,
       COALESCE(m.rule_type = 'disallow', FALSE) AS blocked
FROM urls u LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
  ON m.url = u.url"""


# ---------------------------------------------------------------------------
# sitemap.xml
# ---------------------------------------------------------------------------

SITEMAP_URL_RE = r"(?s)<url>.*?</url>"
SITEMAP_LOC_RE = r"(?s)<loc>([^<]*)</loc>"
SITEMAP_LASTMOD_RE = r"(?s)<lastmod>([^<]*)</lastmod>"

_SM_HEAD = '<?xml version="1.0"?><urlset>'
_SM_TAIL = "</urlset>"


def _sm_entry_col(id_col: str, source_col: str):
    """One <url> entry Column for a (doc_id, source) row: loc always;
    lastmod only when doc_id % 3 == 0 (the optional-field case a
    parser must not desynchronize on); ghost future entries for
    doc_id % 7 == 0 (announced but not yet crawled)."""
    i = F.col(id_col)
    loc = F.concat(F.lit("http://"), F.col(source_col),
                   F.lit("/doc/"), i.cast("string"))
    lastmod = F.when(
        i % 3 == 0,
        F.concat(F.lit("<lastmod>2026-01-"),
                 F.lpad(((i % 28) + 1).cast("string"), 2, "0"),
                 F.lit("</lastmod>"))).otherwise(F.lit(""))
    entry = F.concat(F.lit("<url><loc>"), loc, F.lit("</loc>"),
                     lastmod, F.lit("</url>"))
    ghost = F.when(
        i % 7 == 0,
        F.concat(F.lit("<url><loc>http://"), F.col(source_col),
                 F.lit("/doc/"), (i + 1_000_000).cast("string"),
                 F.lit("</loc></url>"))).otherwise(F.lit(""))
    return F.concat(entry, ghost)


def synthesize_sitemaps(docs: DataFrame, id_col: str = "doc_id",
                        source_col: str = "source") -> DataFrame:
    """Deterministic sitemap.xml bodies: one per source, entries in
    doc_id order; every third entry carries a <lastmod>, every
    seventh announces a not-yet-crawled ghost URL (doc_id + 1e6).

    Output: (domain, xml)."""
    per = docs.select(F.col(source_col).alias("domain"),
                      F.struct(F.col(id_col).cast("long").alias("i"),
                               _sm_entry_col(id_col, source_col)
                               .alias("e")).alias("s"))
    return (per.groupBy("domain")
            .agg(F.concat(
                F.lit(_SM_HEAD),
                F.array_join(F.transform(
                    F.array_sort(F.collect_list("s")),
                    lambda s: s["e"]), ""),
                F.lit(_SM_TAIL)).alias("xml")))


def parse_sitemaps(sitemaps: DataFrame, domain_col: str = "domain",
                   xml_col: str = "xml") -> DataFrame:
    """sitemap.xml bodies -> one row per <url> entry, in document
    order: (domain, entry_idx, loc, lastmod) — absent <lastmod> is ''
    (the regexp_extract no-match convention). Whole-entry blocks keep
    loc and lastmod aligned (two parallel extract_alls would
    desynchronize on entries without a lastmod)."""
    blocks = F.regexp_extract_all(F.col(xml_col),
                                  F.lit(SITEMAP_URL_RE), F.lit(0))
    pairs = F.transform(blocks, lambda b: F.struct(
        F.regexp_extract(b, SITEMAP_LOC_RE, 1).alias("loc"),
        F.regexp_extract(b, SITEMAP_LASTMOD_RE, 1).alias("lastmod")))
    return (sitemaps.select(F.col(domain_col).alias("domain"),
                            F.posexplode(pairs)
                            .alias("entry_idx", "u"))
            .select("domain", F.col("entry_idx").cast("long"),
                    "u.loc", "u.lastmod"))


def sitemap_ctes() -> str:
    """CTE ``sitemaps(domain, xml)`` over ``documents`` —
    byte-identical to :func:`synthesize_sitemaps`."""
    return f"""_sm AS (
  SELECT source AS domain, doc_id,
         '<url><loc>http://' || source || '/doc/'
           || CAST(doc_id AS VARCHAR) || '</loc>'
         || CASE WHEN doc_id % 3 = 0
              THEN '<lastmod>2026-01-'
                || lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0')
                || '</lastmod>' ELSE '' END
         || '</url>'
         || CASE WHEN doc_id % 7 = 0
              THEN '<url><loc>http://' || source || '/doc/'
                || CAST(doc_id + 1000000 AS VARCHAR)
                || '</loc></url>' ELSE '' END AS entry
  FROM documents),
sitemaps AS (
  SELECT domain,
         '{_SM_HEAD}' || string_agg(entry, '' ORDER BY doc_id)
           || '{_SM_TAIL}' AS xml
  FROM _sm GROUP BY domain)"""


def sitemap_parse_select() -> str:
    """DuckDB twin of synthesize_sitemaps |> parse_sitemaps."""
    return f"""WITH {sitemap_ctes()},
blk AS (
  SELECT domain,
         regexp_extract_all(xml, '{SITEMAP_URL_RE}', 0) AS bs
  FROM sitemaps)
SELECT domain, CAST(u.bi - 1 AS BIGINT) AS entry_idx,
       regexp_extract(u.b, '{SITEMAP_LOC_RE}', 1) AS loc,
       regexp_extract(u.b, '{SITEMAP_LASTMOD_RE}', 1) AS lastmod
FROM blk, LATERAL (SELECT unnest(bs) AS b,
                          generate_subscripts(bs, 1) AS bi) u"""


def synthesize_fetch_dates(docs: DataFrame, id_col: str = "doc_id",
                           source_col: str = "source") -> DataFrame:
    """Deterministic last-fetch dates for the synthesized crawl: page
    i was fetched on 2026-01-<((i*5) % 28) + 1> — co-prime with the
    sitemap synthesizer's lastmod day ((i % 28) + 1), so the
    stale/fresh split is a non-trivial deterministic subset.

    Output: (norm_href, fetched_at)."""
    from maps_spark.operators.html import with_norm_url
    i = F.col(id_col)
    return with_norm_url(docs.select(
        F.concat(F.lit("http://"), F.col(source_col), F.lit("/doc/"),
                 F.col(id_col).cast("string")).alias("page_url"),
        F.concat(F.lit("2026-01-"),
                 F.lpad(((i * 5) % 28 + 1).cast("string"), 2, "0"))
        .alias("fetched_at")), "page_url").select(
        "norm_href", "fetched_at")


def recrawl_candidates(sitemaps: DataFrame,
                       fetched: DataFrame) -> DataFrame:
    """The incremental-crawl half of sitemap discovery: announced
    URLs whose ``<lastmod>`` postdates their last successful fetch
    should re-enter the frontier as recrawl candidates. ``fetched``
    is the crawl ledger's (norm_href, fetched_at) table — ISO dates,
    so string comparison IS date comparison in both engines. Entries
    without a lastmod never qualify (no change signal), and an URL
    announced by several sitemaps recrawls on its NEWEST lastmod.

    Scale: one per-URL max aggregation over the parsed entries + one
    equi-join against the ledger — both on the norm_href key.

    Output: (norm_href, domain, lastmod, fetched_at)."""
    from maps_spark.operators.html import DOMAIN_RE, with_norm_url
    ent = (with_norm_url(parse_sitemaps(sitemaps)
                         .where(F.col("lastmod") != "")
                         .select("loc", "lastmod"), "loc")
           .select("norm_href", "lastmod")
           .groupBy("norm_href")
           .agg(F.max("lastmod").alias("lastmod")))
    return (ent.join(fetched.select("norm_href", "fetched_at"),
                     "norm_href")
            .where(F.col("lastmod") > F.col("fetched_at"))
            .select("norm_href",
                    F.regexp_extract("norm_href", DOMAIN_RE, 1)
                    .alias("domain"),
                    "lastmod", "fetched_at"))


def recrawl_candidates_select() -> str:
    """DuckDB twin of synthesize_sitemaps + synthesize_fetch_dates
    |> recrawl_candidates."""
    from maps_spark.operators.html import DOMAIN_RE, norm_url_sql
    page_url = ("'http://' || source || '/doc/' || "
                "CAST(doc_id AS VARCHAR)")
    return f"""WITH {sitemap_ctes()},
blk AS (
  SELECT regexp_extract(u.b, '{SITEMAP_LOC_RE}', 1) AS loc,
         regexp_extract(u.b, '{SITEMAP_LASTMOD_RE}', 1) AS lastmod
  FROM (SELECT regexp_extract_all(xml, '{SITEMAP_URL_RE}', 0) AS bs
        FROM sitemaps) t,
       LATERAL (SELECT unnest(bs) AS b) u),
ent AS (
  SELECT {norm_url_sql('loc')} AS norm_href, max(lastmod) AS lastmod
  FROM blk WHERE lastmod <> '' GROUP BY 1),
fd AS (
  SELECT {norm_url_sql(page_url)} AS norm_href,
         '2026-01-' || lpad(CAST((doc_id * 5) % 28 + 1 AS VARCHAR),
                            2, '0') AS fetched_at
  FROM documents)
SELECT ent.norm_href,
       regexp_extract(ent.norm_href, '{DOMAIN_RE}', 1) AS domain,
       lastmod, fetched_at
FROM ent JOIN fd USING (norm_href)
WHERE lastmod > fetched_at"""


# ---------------------------------------------------------------------------
# redirect-chain resolution
# ---------------------------------------------------------------------------


def synthesize_redirects(docs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Deterministic redirect edges over synthetic URLs
    ``http://r<i%5>.example/p/<i>``: ids with i%30==29 redirect
    BACKWARD to i-1 (forming a 2-cycle with the i%4==0 forward rule
    at i%30 in {28,29}), otherwise ids with i%4 in {0,1} redirect
    forward to i+1 (2-step chains). Each source URL has exactly one
    target (HTTP redirects are single-valued).

    Output: (src_url, dst_url)."""
    i = F.col(id_col)

    def url(j):
        return F.concat(F.lit("http://r"), (j % 5).cast("string"),
                        F.lit(".example/p/"), j.cast("string"))

    dst_id = (F.when(i % 30 == 29, i - 1)
              .when((i % 4).isin(0, 1), i + 1))
    return (docs.select(url(i).alias("src_url"),
                        url(dst_id).alias("dst_url"))
            .where(F.col("dst_url").isNotNull()))


def resolve_redirects(edges: DataFrame, max_hops: int = 4,
                      src_col: str = "src_url",
                      dst_col: str = "dst_url") -> DataFrame:
    """Follow each redirect source through up to ``max_hops`` hops:
    (src_url, final_url, hops, resolved) where ``resolved`` is true
    iff final_url has no outgoing redirect (loops and
    over-long chains come back resolved=false at the hop cap —
    exactly what a fetcher does with HTTP redirect limits).

    Shape: the distinct edge table is checkpointed once and re-joined
    per hop (plan stays one hop deep); each hop is one equi-join on
    the current URL — hops * one shuffle, never a driver loop."""
    e = (edges.select(F.col(src_col).alias("_s"),
                      F.col(dst_col).alias("_d"))
         .distinct().localCheckpoint())
    cur = e.select(F.col("_s").alias("src_url"),
                   F.col("_d").alias("cur"),
                   F.lit(1).cast("long").alias("hops"))
    for _ in range(max_hops - 1):
        cur = (cur.join(e.withColumnRenamed("_s", "cur"), "cur", "left")
               .select("src_url",
                       F.coalesce("_d", F.col("cur")).alias("cur"),
                       F.when(F.col("_d").isNotNull(),
                              F.col("hops") + 1)
                       .otherwise(F.col("hops")).alias("hops"))
               .localCheckpoint())
    out_deg = e.select(F.col("_s").alias("cur")).distinct() \
        .withColumn("_more", F.lit(True))
    return (cur.join(out_deg, "cur", "left")
            .select("src_url", F.col("cur").alias("final_url"), "hops",
                    F.col("_more").isNull().alias("resolved")))


def apply_redirects(cand: DataFrame, redirects: DataFrame,
                    seen: DataFrame,
                    ranks: DataFrame | None = None,
                    max_hops: int = 4) -> DataFrame:
    """Canonicalize an assembled frontier through the redirect graph
    — the alias-resolution step a real crawler runs BEFORE deciding
    what to fetch, so an already-crawled page is never refetched
    under a redirecting alias:

    - a candidate that is a redirect SOURCE is replaced by its final
      URL (:func:`resolve_redirects`, normalized);
    - unresolved chains (loops / over ``max_hops``) drop — a fetcher
      gives up on them at its redirect limit anyway;
    - candidates whose final URL is already in ``seen`` drop;
    - aliases collapsing onto one final URL merge: reference counts
      sum (``n_ref_docs`` becomes an upper bound — a doc referencing
      two aliases of one page counts twice; exact would re-scan the
      refs store for a rare case), ``via`` provenance re-derives from
      the contributing rows, and ``domain_rank`` re-scores against
      ``ranks`` for the FINAL URL's domain (falling back to the best
      contributing alias rank when that domain is unranked).

    Scale: one left join on norm_href against the (bounded) resolved
    redirect map, one anti-join against seen, one regroup on the
    canonical URL — all on the frontier's existing shuffle key.

    Output: cand's columns (via preserved when present)."""
    from maps_spark.operators.html import (DOMAIN_RE,
                                           _broadcast_if_small,
                                           with_norm_url)
    res = resolve_redirects(redirects, max_hops=max_hops)
    # staged normalization (html.with_norm_url): the .distinct() is
    # an aggregate whose key would otherwise inline BOTH expanded
    # normalization trees (2 x 31 regexps) into one generated method
    alias_map = (with_norm_url(with_norm_url(
        res.select("src_url", "final_url", "resolved"), "src_url"),
        "final_url", "_final")
        .select("norm_href", "_final",
                F.col("resolved").alias("_resolved")).distinct())
    has_via = "via" in cand.columns
    x = (cand.join(_broadcast_if_small(alias_map), "norm_href", "left")
         .where(F.col("_resolved").isNull() | F.col("_resolved"))
         .withColumn("_eff", F.coalesce("_final", F.col("norm_href")))
         .join(seen.select(F.col("norm_href").alias("_eff")),
               "_eff", "left_anti"))
    aggs = [F.sum("n_refs").cast("long").alias("n_refs"),
            F.sum("n_ref_docs").cast("long").alias("n_ref_docs"),
            F.max("domain_rank").alias("_alias_rank")]
    if has_via:
        aggs += [F.max(F.col("via").isin("links", "both"))
                 .alias("_has_lk"),
                 F.max(F.col("via").isin("sitemap", "both"))
                 .alias("_has_sm")]
    agg = (x.groupBy("_eff").agg(*aggs)
           .withColumn("domain",
                       F.regexp_extract("_eff", DOMAIN_RE, 1)))
    if ranks is not None:
        dr = ranks.select(F.col("node").alias("domain"),
                          F.col("rank_scaled").alias("_drr"))
        agg = agg.join(_broadcast_if_small(dr), "domain", "left")
        rank = F.coalesce("_drr", "_alias_rank", F.lit(0))
    else:
        rank = F.coalesce("_alias_rank", F.lit(0))
    cols = [F.col("_eff").alias("norm_href"), F.col("domain"),
            "n_refs", "n_ref_docs",
            rank.cast("long").alias("domain_rank")]
    if has_via:
        cols.append(
            F.when(F.col("_has_lk") & F.col("_has_sm"), "both")
            .when(F.col("_has_sm"), "sitemap")
            .otherwise("links").alias("via"))
    return agg.select(*cols)


def redirect_frontier_select(pr_iters: int = 3) -> str:
    """DuckDB twin of the ``redirect_frontier`` gate: the frontier
    canonicalized through a frontier-derived redirect set — every
    candidate URL ending in an odd digit 301s to ``<url>/r``, every
    one ending in '0' self-loops (unresolvable -> dropped), the rest
    are untouched. Closed-form: eff-URL regroup with summed reference
    counts and the alias-rank fallback (the gate passes ranks=None)."""
    from maps_spark.operators.html import (DOMAIN_RE,
                                           frontier_candidates_select)
    return f"""WITH fc AS ({frontier_candidates_select(pr_iters)}),
eff AS (
  SELECT CASE WHEN right(norm_href, 1) IN ('1','3','5','7','9')
              THEN norm_href || '/r' ELSE norm_href END AS norm_href,
         n_refs, n_ref_docs, domain_rank
  FROM fc WHERE right(norm_href, 1) <> '0')
SELECT norm_href,
       regexp_extract(norm_href, '{DOMAIN_RE}', 1) AS domain,
       CAST(sum(n_refs) AS BIGINT) AS n_refs,
       CAST(sum(n_ref_docs) AS BIGINT) AS n_ref_docs,
       CAST(COALESCE(max(domain_rank), 0) AS BIGINT) AS domain_rank
FROM eff GROUP BY 1"""


def redirect_resolve_select(max_hops: int = 4) -> str:
    """DuckDB twin of synthesize_redirects |> resolve_redirects —
    the unrolled-CTE discipline of the pagerank oracle."""
    url = ("'http://r' || CAST({j} % 5 AS VARCHAR) || '.example/p/' "
           "|| CAST({j} AS VARCHAR)")
    ctes = [f"""e AS (
  SELECT DISTINCT {url.format(j='doc_id')} AS s,
         {url.format(j='di')} AS d
  FROM (SELECT doc_id,
               CASE WHEN doc_id % 30 = 29 THEN doc_id - 1
                    WHEN doc_id % 4 IN (0, 1) THEN doc_id + 1
               END AS di
        FROM documents)
  WHERE di IS NOT NULL)""",
            """c0 AS (
  SELECT s AS src_url, d AS cur, CAST(1 AS BIGINT) AS hops FROM e)"""]
    for k in range(max_hops - 1):
        ctes.append(f"""c{k + 1} AS (
  SELECT c.src_url,
         COALESCE(e.d, c.cur) AS cur,
         CASE WHEN e.d IS NOT NULL THEN c.hops + 1
              ELSE c.hops END AS hops
  FROM c{k} c LEFT JOIN e ON e.s = c.cur)""")
    last = f"c{max_hops - 1}"
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT c.src_url, c.cur AS final_url, c.hops,
       (o.s IS NULL) AS resolved
FROM {last} c
LEFT JOIN (SELECT DISTINCT s FROM e) o ON o.s = c.cur""")


# ---------------------------------------------------------------------------
# fetch retry scheduling
# ---------------------------------------------------------------------------


def synthesize_fetch_log(docs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Deterministic fetch-attempt log over the synthetic URLs:
    URL i has (i % 3) + 1 attempts; attempt a's status is 200 when
    (i + a) % 3 == 0, else 503 for odd ids (transient) and 404 for
    even ids (permanent).

    Output: (url, attempt, status)."""
    i = F.col(id_col)
    url = F.concat(F.lit("http://r"), (i % 5).cast("string"),
                   F.lit(".example/p/"), i.cast("string"))
    a = F.explode(F.sequence(F.lit(0), (i % 3).cast("int")))
    base = docs.select(url.alias("url"), i.alias("_i"), a.alias("attempt"))
    status = (F.when((F.col("_i") + F.col("attempt")) % 3 == 0, 200)
              .when(F.col("_i") % 2 == 1, 503).otherwise(404))
    return base.select("url", F.col("attempt").cast("long"),
                       status.cast("long").alias("status"))


def fetch_schedule(log: DataFrame, base_delay_s: int = 60,
                   max_retries: int = 3,
                   cap_s: int = 3600) -> DataFrame:
    """Per-URL crawl scheduling from an attempt log: the standard
    truncated-exponential-backoff policy. last_status is the status
    of the highest attempt; n_failures counts status >= 400;
    action is 'done' (last fetch succeeded), 'drop' (permanent 404 or
    retry budget exhausted) or 'retry'; next_delay_s is
    min(base << n_failures, cap) for retries, else 0.

    One per-URL aggregation (map-side combinable), zero joins.

    Output: (url, n_attempts, n_failures, last_status, action,
    next_delay_s)."""
    agg = log.groupBy("url").agg(
        F.count("*").cast("long").alias("n_attempts"),
        F.sum(F.when(F.col("status") >= 400, 1).otherwise(0))
        .cast("long").alias("n_failures"),
        F.max_by("status", "attempt").cast("long").alias("last_status"))
    action = (F.when(F.col("last_status") < 400, "done")
              .when((F.col("last_status") == 404) |
                    (F.col("n_attempts") >= max_retries), "drop")
              .otherwise("retry"))
    delay = F.least(
        F.expr(f"shiftleft(CAST({int(base_delay_s)} AS BIGINT), "
               f"CAST(least(n_failures, 30) AS INT))"),
        F.lit(cap_s).cast("long"))
    return agg.select(
        "url", "n_attempts", "n_failures", "last_status",
        action.alias("action"),
        F.when(action == "retry", delay).otherwise(F.lit(0))
        .cast("long").alias("next_delay_s"))


def fetch_schedule_select(base_delay_s: int = 60, max_retries: int = 3,
                          cap_s: int = 3600) -> str:
    """DuckDB twin of synthesize_fetch_log |> fetch_schedule."""
    return f"""WITH log AS (
  SELECT 'http://r' || CAST(doc_id % 5 AS VARCHAR) || '.example/p/'
           || CAST(doc_id AS VARCHAR) AS url,
         CAST(u.a AS BIGINT) AS attempt,
         CAST(CASE WHEN (doc_id + u.a) % 3 = 0 THEN 200
                   WHEN doc_id % 2 = 1 THEN 503
                   ELSE 404 END AS BIGINT) AS status
  FROM documents,
       LATERAL (SELECT unnest(generate_series(0, doc_id % 3)) AS a) u),
agg AS (
  SELECT url, CAST(count(*) AS BIGINT) AS n_attempts,
         CAST(sum(CASE WHEN status >= 400 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_failures,
         CAST(arg_max(status, attempt) AS BIGINT) AS last_status
  FROM log GROUP BY url),
act AS (
  SELECT *, CASE WHEN last_status < 400 THEN 'done'
                 WHEN last_status = 404 OR n_attempts >= {max_retries}
                   THEN 'drop'
                 ELSE 'retry' END AS action
  FROM agg)
SELECT url, n_attempts, n_failures, last_status, action,
       CAST(CASE WHEN action = 'retry'
              THEN least({base_delay_s} * (1 << least(n_failures, 30)),
                         {cap_s})
              ELSE 0 END AS BIGINT) AS next_delay_s
FROM act"""


def fetch_timeline(plan: DataFrame, default_gap_s: int = 1) -> DataFrame:
    """Materialize the politeness schedule a shard worker executes:
    each planned URL's earliest fetch offset within its host's
    timeline. A host's URLs are spaced ``max(crawl_delay_s,
    default_gap_s)`` apart in ``host_rank`` order (the plan's
    deterministic per-host ordering), and a URL carrying retry
    backoff (``next_delay_s``) never fires before its backoff
    expires:

        scheduled_offset_s = max((host_rank - 1) * gap, next_delay_s)

    Pure per-row integer arithmetic over the plan (no shuffle beyond
    what built the plan) — the worker sorts its shard by offset and
    sleeps the gaps.

    Output: plan columns + (gap_s, scheduled_offset_s)."""
    gap = F.greatest(
        F.coalesce(F.col("crawl_delay_s"), F.lit(0)),
        F.lit(default_gap_s)).cast("long") \
        if "crawl_delay_s" in plan.columns else \
        F.lit(default_gap_s).cast("long")
    delay = (F.coalesce(F.col("next_delay_s"), F.lit(0))
             if "next_delay_s" in plan.columns else F.lit(0))
    return (plan.withColumn("gap_s", gap)
            .withColumn("scheduled_offset_s",
                        F.greatest(
                            (F.col("host_rank") - 1) * F.col("gap_s"),
                            delay.cast("long")).cast("long")))


def fetch_timeline_select(per_host_cap: int = 5, n_shards: int = 8,
                          pr_iters: int = 3,
                          crawl_delay_s: int = 3,
                          default_gap_s: int = 1) -> str:
    """DuckDB twin of frontier_shards |> (uniform robots crawl-delay)
    |> fetch_timeline — the gate plants one corpus-wide
    ``crawl_delay_s`` so the spacing arithmetic is exercised without
    a second rules join."""
    from maps_spark.operators.html import frontier_shards_select
    gap = max(crawl_delay_s, default_gap_s)
    return f"""WITH fs AS ({frontier_shards_select(per_host_cap,
                                                   n_shards, pr_iters)})
SELECT norm_href, domain, host_rank, shard, n_refs, n_ref_docs,
       domain_rank, CAST({gap} AS BIGINT) AS gap_s,
       CAST((host_rank - 1) * {gap} AS BIGINT) AS scheduled_offset_s
FROM fs"""


# ---------------------------------------------------------------------------
# Sitemap-aware frontier: merge announced URLs into the crawl frontier
# ---------------------------------------------------------------------------


def merge_sitemap_locs(cand: DataFrame, sitemaps: DataFrame,
                       seen: DataFrame, ranks: DataFrame) -> DataFrame:
    """Merge sitemap-announced URLs into an ALREADY-ASSEMBLED
    frontier: the store-level half of :func:`frontier_with_sitemaps`,
    shared verbatim with it so the gate-proven semantics and the
    crawl loop can never drift. ``cand`` is a frontier table
    (norm_href, domain, n_refs, n_ref_docs, domain_rank), ``seen``
    the crawled-URL set, ``ranks`` the (node, rank_scaled) PageRank
    table sitemap-only rows are scored against.

    Output: cand's columns + ``via`` ('links' | 'sitemap' | 'both')."""
    from maps_spark.operators.html import DOMAIN_RE, with_norm_url
    locs = (with_norm_url(parse_sitemaps(sitemaps).select("loc"),
                          "loc")
            .select("norm_href")
            .distinct()
            .join(seen.select("norm_href"), "norm_href", "left_anti")
            .withColumn("_sm", F.lit(True)))
    dr = ranks.select(F.col("node").alias("_drd"),
                      F.col("rank_scaled").alias("_drr"))
    merged = (cand.withColumn("_lk", F.lit(True))
              .join(locs, "norm_href", "full_outer")
              .withColumn("dom", F.coalesce(
                  "domain", F.regexp_extract("norm_href", DOMAIN_RE, 1))))
    via = (F.when(F.col("_lk").isNotNull() & F.col("_sm").isNotNull(),
                  "both")
           .when(F.col("_sm").isNotNull(), "sitemap")
           .otherwise("links"))
    return (merged.join(dr, merged["dom"] == dr["_drd"], "left")
            .select("norm_href", F.col("dom").alias("domain"),
                    F.coalesce("n_refs", F.lit(0)).cast("long")
                    .alias("n_refs"),
                    F.coalesce("n_ref_docs", F.lit(0)).cast("long")
                    .alias("n_ref_docs"),
                    F.coalesce("domain_rank", "_drr", F.lit(0))
                    .cast("long").alias("domain_rank"),
                    via.alias("via")))


def frontier_with_sitemaps(pages: DataFrame, sitemaps: DataFrame,
                           pr_iters: int = 3) -> DataFrame:
    """The crawl frontier with sitemap discovery merged in: every
    link-discovered candidate (:func:`operators.html.
    frontier_candidates`, with its reference counts and domain
    PageRank) plus every sitemap-announced URL not yet crawled, as a
    zero-reference candidate. ``via`` says how each URL was
    discovered ('links', 'sitemap', or 'both' when a sitemap confirms
    a link-discovered URL). Sitemap-only rows are scored against the
    RANK TABLE itself — a ranked domain whose link-discovered URLs
    are all crawled still ranks its announcements — else 0: a domain
    nobody links to has no rank, announced or not.

    Scale: one full-outer join on the shared norm_href key; the
    per-domain rank side-table is left unhinted so AQE broadcasts it
    only when it is actually small at runtime.

    Output: (norm_href, domain, n_refs, n_ref_docs, domain_rank,
    via)."""
    from maps_spark.operators.graph import pagerank
    from maps_spark.operators.html import (_links_with_source,
                                           candidate_refs,
                                           frontier_assemble,
                                           page_urls,
                                           site_domain_edges)
    # decomposed so the RANK TABLE itself (not the candidate table's
    # projection of it) scores sitemap-only rows: a ranked domain
    # whose link-discovered URLs are all crawled never appears among
    # the candidates, but its announced URLs must still carry its
    # rank
    links = _links_with_source(pages).localCheckpoint()
    edges = site_domain_edges(pages, links=links)
    ranks = pagerank(edges, iters=pr_iters)  # localCheckpointed inside
    seen = page_urls(pages)
    cand = frontier_assemble(candidate_refs(pages, links=links),
                             seen, edges, ranks=ranks)
    return merge_sitemap_locs(cand, sitemaps, seen, ranks)


def frontier_sitemap_merge_select(pr_iters: int = 3) -> str:
    """DuckDB twin of synthesize_sitemaps |> frontier_with_sitemaps
    over the synthesized pages."""
    from maps_spark.operators.graph import pagerank_select
    from maps_spark.operators.html import (DOMAIN_RE,
                                           frontier_candidates_select,
                                           norm_url_sql,
                                           site_domain_edges_select)
    page_url = ("'http://' || source || '/doc/' || "
                "CAST(doc_id AS VARCHAR)")
    pr = pagerank_select(site_domain_edges_select(), iters=pr_iters)
    return f"""WITH fc AS ({frontier_candidates_select(pr_iters)}),
{sitemap_ctes()},
sblk AS (
  SELECT regexp_extract(u.b, '{SITEMAP_LOC_RE}', 1) AS loc
  FROM (SELECT regexp_extract_all(xml, '{SITEMAP_URL_RE}', 0) AS bs
        FROM sitemaps) t,
       LATERAL (SELECT unnest(bs) AS b) u),
locs AS (SELECT DISTINCT {norm_url_sql('loc')} AS norm_href FROM sblk),
seen2 AS (
  SELECT DISTINCT {norm_url_sql(page_url)} AS norm_href
  FROM documents),
smn AS (
  SELECT norm_href, TRUE AS _sm FROM locs
  WHERE norm_href NOT IN (SELECT norm_href FROM seen2)),
dr AS (
  SELECT node AS domain, CAST(rank_scaled AS BIGINT) AS domain_rank
  FROM ({pr})),
m AS (
  SELECT COALESCE(fc.norm_href, smn.norm_href) AS norm_href,
         COALESCE(fc.domain,
                  regexp_extract(smn.norm_href, '{DOMAIN_RE}', 1))
           AS dom,
         fc.n_refs, fc.n_ref_docs, fc.domain_rank,
         fc.norm_href IS NOT NULL AS _lk, smn._sm
  FROM fc FULL OUTER JOIN smn ON fc.norm_href = smn.norm_href)
SELECT m.norm_href, m.dom AS domain,
       CAST(COALESCE(m.n_refs, 0) AS BIGINT) AS n_refs,
       CAST(COALESCE(m.n_ref_docs, 0) AS BIGINT) AS n_ref_docs,
       CAST(COALESCE(m.domain_rank, dr.domain_rank, 0) AS BIGINT)
         AS domain_rank,
       CASE WHEN m._lk AND m._sm THEN 'both'
            WHEN m._sm THEN 'sitemap'
            ELSE 'links' END AS via
FROM m LEFT JOIN dr ON dr.domain = m.dom"""
