"""HTML main-text extraction: block-level boilerplate removal.

The front-of-pipeline operator a raw-web training corpus needs before
any of the quality/dedup machinery in :mod:`maps_spark.operators.text`
applies: every public corpus recipe (C4 / CCNet / RefinedWeb-style)
starts at raw HTML -> main text. The reference (gbif/maps) has no HTML
pipeline — it ingests structured occurrence rows — so this is declared
new scope, following the PUBLIC jusText / Boilerpipe family of
block-segmentation heuristics (Pomikálek 2011; Kohlschütter et al.,
WSDM 2010): segment the page into text blocks at block-level tag
boundaries, then keep a block iff it is long enough AND its *link
density* (fraction of its visible characters contributed by anchor
text) is low. Navigation, ads, sidebars and footers are short and/or
link-heavy; body paragraphs are long and link-sparse.

Engineering rules (shared with the DuckDB oracle twin — every regex
below parses identically in Java regex and RE2, same discipline as
``normalize_text``):

- NO lookahead/backreferences (RE2 lacks them). Tag-name matches are
  anchored by requiring whitespace-or-``>`` structurally:
  ``(?:\\s[^>]*)?\\s*/?>`` — so ``<li>`` matches but ``<link ...>``
  does not, ``<a href=..>`` matches but ``<aside>`` does not.
- link density compares as INTEGER cross-multiplication
  (``link_chars * den <= txt_len * num``), never a float ratio, so
  both engines decide keep/drop bit-identically.
- everything is pure Column / list-function codegen — zero shuffles,
  zero Python UDFs; at 100 TB this runs entirely inside the scan
  stage's WholeStageCodegen span, embarrassingly parallel per row.

Entity decoding covers the six common named/numeric entities via
sequential ``replace`` (``&amp;`` last so ``&amp;lt;`` decodes to the
literal ``&lt;`` a correct single-pass decoder would produce for the
double-escape, not ``<``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# --------------------------------------------------------------------------
# Transient cache registry: the one-parse-per-page operators persist a
# shared block/link frame; entries registered here are released by
# release_transients() so repeated driver calls (per crawl round, per
# gate batch) don't accumulate cached blocks for the session lifetime.
# --------------------------------------------------------------------------

_TRANSIENTS: list[DataFrame] = []


def _persist_transient(df: DataFrame) -> DataFrame:
    """persist() a shared intermediate and register it for release.
    Callers that materialize the returned plan (drivers, gate runners)
    should call :func:`release_transients` afterwards."""
    df = df.persist()
    _TRANSIENTS.append(df)
    return df


def transient_mark() -> int:
    """Ownership token: a pipeline takes a mark before building, and
    releases only the transients IT registered —
    ``release_transients(mark)`` — so a pipeline nested inside
    another never unpersists its caller's still-pending caches. The
    guarantee is LIFO: releases must nest like the pipelines do (a
    stale mark taken before an already-released deeper scope would
    pop an outer pipeline's entries). Every in-repo caller is either
    sequential or strictly nested."""
    return len(_TRANSIENTS)


def release_transients(mark: int = 0) -> int:
    """Unpersist transients registered after ``mark`` (default: all);
    returns how many. Safe to call at any time — a released frame
    recomputes if re-used."""
    n = 0
    while len(_TRANSIENTS) > mark:
        _TRANSIENTS.pop().unpersist()
        n += 1
    return n


# Domain-cardinality tables (the site-template set, the domain
# PageRank table) are broadcast into their consuming joins — the right
# plan at gate scale and for most corpora, but a 100 TB web corpus has
# O(10^7-10^8) domains and the broadcast can reach GBs. Above this row
# threshold the join falls back to a plain shuffle (the keys are exact
# equi-keys either way). Counting is cheap at both call sites: the
# rank table is localCheckpointed by pagerank and the template set is
# localCheckpointed before the guard runs.
BROADCAST_MAX_ROWS = 2_000_000


def _broadcast_if_small(df: DataFrame,
                        max_rows: int | None = None) -> DataFrame:
    """Broadcast hint iff the frame is small enough to ship to every
    executor; otherwise return it unhinted (shuffle join)."""
    limit = BROADCAST_MAX_ROWS if max_rows is None else max_rows
    if df.limit(limit + 1).count() <= limit:
        return F.broadcast(df)
    return df


# --------------------------------------------------------------------------
# Shared (Java-regex AND RE2 compatible) rules — single-sourced here,
# imported by the DuckDB oracle builders below.
# --------------------------------------------------------------------------

SCRIPT_RE = r"(?is)<script(?:\s[^>]*)?>.*?</script\s*>"
STYLE_RE = r"(?is)<style(?:\s[^>]*)?>.*?</style\s*>"
COMMENT_RE = r"(?s)<!--.*?-->"
# block-level boundaries: the tag list of the jusText family. The
# trailing (?:\s[^>]*)?\s*/?> keeps prefixes honest (<li> yes,
# <link..> no) without RE2-unsupported lookahead.
_BLOCK_TAGS = ("p|div|li|ul|ol|h[1-6]|table|thead|tbody|tr|td|th|section"
               "|article|aside|header|footer|nav|form|blockquote|pre"
               "|figure|figcaption|main|br|hr")
BLOCK_TAG_RE = r"(?is)</?(?:" + _BLOCK_TAGS + r")(?:\s[^>]*)?\s*/?>"
ANCHOR_RE = r"(?is)<a(?:\s[^>]*)?>.*?</a\s*>"
TAG_RE = r"(?s)<[^>]*>"
CTRL_RE = r"[\x00-\x1F\x7F]"
WS_RE = r"\s+"
BLOCK_SEP = "\x1e"  # record separator; never occurs in real text

ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))

MIN_BLOCK_CHARS = 30  # jusText-style length gate
LINK_NUM, LINK_DEN = 1, 3  # keep iff link_chars/txt_len <= 1/3


def _txt_col(x: Column) -> Column:
    """Visible text of an HTML fragment: strip tags, decode entities,
    control chars to spaces, collapse whitespace, trim."""
    s = F.regexp_replace(x, TAG_RE, " ")
    for ent, ch in ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.regexp_replace(s, CTRL_RE, " ")
    return F.trim(F.regexp_replace(s, WS_RE, " "))


def _block_structs(html: Column) -> Column:
    """Non-empty text blocks of a page as array<struct{txt, lc}> where
    ``lc`` is the anchor-text character count (link chars)."""
    m = F.regexp_replace(html, SCRIPT_RE, " ")
    m = F.regexp_replace(m, STYLE_RE, " ")
    m = F.regexp_replace(m, COMMENT_RE, " ")
    m = F.regexp_replace(m, BLOCK_TAG_RE, BLOCK_SEP)
    blocks = F.split(m, BLOCK_SEP)
    # two-stage like the oracle's b0/blk: the ~9-pass _txt_col regex
    # chain runs exactly twice per block (with and without anchors) —
    # Catalyst does not CSE the repeated subtree a one-stage struct
    # would need three of
    raw = F.transform(blocks, lambda x: F.struct(
        _txt_col(x).alias("t"),
        _txt_col(F.regexp_replace(x, ANCHOR_RE, " ")).alias("na")))
    stats = F.transform(raw, lambda s: F.struct(
        s["t"].alias("txt"),
        (F.length(s["t"]) - F.length(s["na"])).alias("lc")))
    return F.filter(stats, lambda s: s["txt"] != "")


def _keep(s: Column, min_chars: int, num: int, den: int) -> Column:
    return ((F.length(s["txt"]) >= min_chars) &
            (s["lc"] * den <= F.length(s["txt"]) * num))


def extract_main_text(docs: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id",
                      min_chars: int = MIN_BLOCK_CHARS,
                      max_link_num: int = LINK_NUM,
                      max_link_den: int = LINK_DEN) -> DataFrame:
    """Main text + extraction stats per page.

    Output: (id, main_text, n_blocks, n_kept, n_dropped, chars_kept,
    chars_dropped) — ``main_text`` is the kept blocks joined with
    newlines, in document order; counts cover non-empty blocks only.
    """
    tmp = docs.select(F.col(id_col),
                      _block_structs(F.col(html_col)).alias("_b"))
    kept = F.filter(F.col("_b"),
                    lambda s: _keep(s, min_chars, max_link_num,
                                    max_link_den))
    dropped = F.filter(F.col("_b"),
                       lambda s: ~_keep(s, min_chars, max_link_num,
                                        max_link_den))

    def _chars(arr):
        return F.aggregate(arr, F.lit(0).cast("long"),
                           lambda a, s: a + F.length(s["txt"]))

    return tmp.select(
        id_col,
        F.array_join(F.transform(kept, lambda s: s["txt"]), "\n")
        .alias("main_text"),
        F.size("_b").cast("long").alias("n_blocks"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size("_b") - F.size(kept)).cast("long").alias("n_dropped"),
        _chars(kept).alias("chars_kept"),
        _chars(dropped).alias("chars_dropped"))


def html_block_stats(docs: DataFrame, html_col: str = "html",
                     id_col: str = "doc_id",
                     min_chars: int = MIN_BLOCK_CHARS,
                     max_link_num: int = LINK_NUM,
                     max_link_den: int = LINK_DEN) -> DataFrame:
    """Per-block extraction diagnostics: (id, block_idx, block_text,
    txt_len, link_chars, kept) — the granular twin of
    :func:`extract_main_text` for rule auditing (pages with zero
    non-empty blocks emit no rows)."""
    tmp = docs.select(F.col(id_col),
                      _block_structs(F.col(html_col)).alias("_b"))
    withidx = F.transform(
        F.col("_b"),
        lambda s, i: F.struct(
            i.cast("long").alias("block_idx"),
            s["txt"].alias("block_text"),
            F.length(s["txt"]).cast("long").alias("txt_len"),
            s["lc"].cast("long").alias("link_chars"),
            _keep(s, min_chars, max_link_num, max_link_den)
            .alias("kept")))
    return (tmp.select(id_col, F.explode(withidx).alias("u"))
            .select(id_col, "u.block_idx", "u.block_text", "u.txt_len",
                    "u.link_chars", "u.kept"))


# --------------------------------------------------------------------------
# Deterministic page synthesis — the gate input. Wraps each document's
# text in a realistic boilerplate shell (head/script/style, nav, ad
# block, sidebar, entity-bearing footer) with the body split into
# <p> paragraphs of WORDS_PER_PAR words. Dual-dialect: the Column
# builder and the SQL twin emit byte-identical pages.
# --------------------------------------------------------------------------

WORDS_PER_PAR = 25

# no apostrophes anywhere (the SQL twin inlines these in '...' strings)
_P_HEAD0 = ('<html lang="')
_P_HEAD1 = ('"><head><title>digest ')
_P_META1 = ('</title><meta name="description" content="digest ')
_P_META2 = (' from ')
_P_HEAD2 = ('"><script type="text/javascript">var page=')
_P_HEAD3 = (';track();</script><style>.nav a{color:#00f;font-weight:bold}'
            '</style><link rel="stylesheet" href="/main.css"></head>'
            '<body><nav class="nav"><a href="/">home</a> '
            '<a href="/news">news</a> <a href="/about">about us</a> '
            '<a href="/contact">contact</a></nav><header><h2>')
_P_HEAD4 = (' daily digest</h2></header><!-- rendered by pipeline -->'
            '<div class="ad"><a href="/buy">buy premium access today</a> '
            '<a href="/offer">limited time offer inside</a></div>'
            '<div class="content">')
_P_TAIL1 = ('</div><aside class="related"><ul>'
            '<li><a href="/t/1">trending topic one</a></li>'
            '<li><a href="/t/2">trending topic two</a></li>'
            '<li><a href="/t/3">trending topic three</a></li>'
            '<li><a href="http://partner')
_P_TAIL2 = ('.example/ref">partner site</a></li></ul>'
            '</aside><footer>copyright &amp; database rights 2026 ')
_P_TAIL3 = (' <a href="/terms">terms of use</a> '
            '<a href="/privacy">privacy policy</a> '
            '<a href="/doc/')
_P_TAIL4 = ('">next digest</a></footer></body></html>')


def synthesize_html(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", source_col: str = "source",
                    lang_col: str = "lang",
                    words_per_par: int = WORDS_PER_PAR) -> DataFrame:
    """Append a deterministic ``html`` page column (see module note).
    Pure codegen; the inverse property (extraction recovers exactly the
    long-enough paragraphs) is pinned in tests."""
    w = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    npar = (F.floor((F.greatest(F.size(w), F.lit(1)) - 1)
                    / float(words_per_par)).cast("long") + 1)
    paras = F.transform(
        F.sequence(F.lit(0).cast("long"), npar - 1),
        lambda i: F.concat(
            F.lit("<p>"),
            F.array_join(F.slice(w, i * words_per_par + 1,
                                 F.lit(words_per_par)), " "),
            F.lit("</p>")))
    ids = F.col(id_col).cast("string")
    partner = (F.col(id_col) % 7).cast("string")
    nxt = (F.col(id_col) + 1).cast("string")
    page = F.concat(F.lit(_P_HEAD0), F.col(lang_col),
                    F.lit(_P_HEAD1), ids,
                    F.lit(_P_META1), ids,
                    F.lit(_P_META2), F.col(source_col),
                    F.lit(_P_HEAD2), ids,
                    F.lit(_P_HEAD3), F.col(source_col),
                    F.lit(_P_HEAD4), F.array_join(paras, ""),
                    F.lit(_P_TAIL1), partner,
                    F.lit(_P_TAIL2), F.col(source_col),
                    F.lit(_P_TAIL3), nxt, F.lit(_P_TAIL4))
    return docs.withColumn("html", page)


# --------------------------------------------------------------------------
# DuckDB oracle twins (used by plans.queries / __spark_entry__).
# --------------------------------------------------------------------------

def _pages_ctes(words_per_par: int = WORDS_PER_PAR) -> str:
    """CTE chain `pages(doc_id, source, html)` over `documents` —
    byte-identical to :func:`synthesize_html`."""
    p = words_per_par
    return f"""_pw AS (
  SELECT doc_id, source, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS w
  FROM documents),
_pn AS (
  SELECT doc_id, source, lang, w,
         CAST(floor((greatest(len(w), 1) - 1) / {float(p)}) AS BIGINT)
           + 1 AS np
  FROM _pw),
pages AS (
  SELECT doc_id, source,
         '{_P_HEAD0}' || lang
         || '{_P_HEAD1}' || CAST(doc_id AS VARCHAR)
         || '{_P_META1}' || CAST(doc_id AS VARCHAR)
         || '{_P_META2}' || source
         || '{_P_HEAD2}'
         || CAST(doc_id AS VARCHAR) || '{_P_HEAD3}' || source
         || '{_P_HEAD4}'
         || array_to_string(list_transform(
              generate_series(CAST(0 AS BIGINT), np - 1),
              i -> '<p>' || COALESCE(array_to_string(
                     list_slice(w, i * {p} + 1, i * {p} + {p}), ' '),
                     '')
                   || '</p>'), '')
         || '{_P_TAIL1}' || CAST(doc_id % 7 AS VARCHAR)
         || '{_P_TAIL2}' || source
         || '{_P_TAIL3}' || CAST(doc_id + 1 AS VARCHAR)
         || '{_P_TAIL4}' AS html
  FROM _pn)"""


def _txt_sql(x: str) -> str:
    s = f"regexp_replace({x}, '{TAG_RE}', ' ', 'g')"
    for ent, ch in ENTITIES:
        s = f"replace({s}, '{ent}', '{ch}')" if ch != "'" else \
            f"replace({s}, '{ent}', '''')"
    s = f"regexp_replace({s}, '{CTRL_RE}', ' ', 'g')"
    return f"trim(regexp_replace({s}, '{WS_RE}', ' ', 'g'))"


def _blocks_ctes(words_per_par: int = WORDS_PER_PAR) -> str:
    """CTE chain ending in `blk(doc_id, blocks)` where blocks is a
    list<struct{txt, lc}> of the non-empty page blocks."""
    return f"""{_pages_ctes(words_per_par)},
marked AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           html, '{SCRIPT_RE}', ' ', 'g'), '{STYLE_RE}', ' ', 'g'),
           '{COMMENT_RE}', ' ', 'g'), '{BLOCK_TAG_RE}', chr(30), 'g')
           AS m
  FROM pages),
b0 AS (
  SELECT doc_id,
         list_transform(string_split(m, chr(30)),
           x -> struct_pack(
             t := {_txt_sql('x')},
             na := {_txt_sql(f"regexp_replace(x, '{ANCHOR_RE}', ' ', 'g')")}))
           AS raw
  FROM marked),
blk AS (
  SELECT doc_id,
         list_filter(list_transform(raw,
             s -> struct_pack(txt := s.t,
                              lc := length(s.t) - length(s.na))),
           s -> s.txt <> '') AS blocks
  FROM b0)"""


def _keep_sql(s: str, min_chars: int, num: int, den: int) -> str:
    return (f"(length({s}.txt) >= {min_chars} AND "
            f"{s}.lc * {den} <= length({s}.txt) * {num})")


def html_extract_select(min_chars: int = MIN_BLOCK_CHARS,
                        num: int = LINK_NUM,
                        den: int = LINK_DEN) -> str:
    """DuckDB twin of synthesize_html |> extract_main_text."""
    keep = _keep_sql("s", min_chars, num, den)
    return f"""WITH {_blocks_ctes()},
split AS (
  SELECT doc_id,
         list_filter(blocks, s -> {keep}) AS kept,
         list_filter(blocks, s -> NOT {keep}) AS dropped,
         blocks
  FROM blk)
SELECT doc_id,
       COALESCE(array_to_string(list_transform(kept, s -> s.txt),
                                chr(10)), '') AS main_text,
       CAST(len(blocks) AS BIGINT) AS n_blocks,
       CAST(len(kept) AS BIGINT) AS n_kept,
       CAST(len(blocks) - len(kept) AS BIGINT) AS n_dropped,
       CAST(coalesce(list_aggregate(
              list_transform(kept, s -> length(s.txt)), 'sum'), 0)
            AS BIGINT) AS chars_kept,
       CAST(coalesce(list_aggregate(
              list_transform(dropped, s -> length(s.txt)), 'sum'), 0)
            AS BIGINT) AS chars_dropped
FROM split"""


def html_block_stats_select(min_chars: int = MIN_BLOCK_CHARS,
                            num: int = LINK_NUM,
                            den: int = LINK_DEN) -> str:
    """DuckDB twin of synthesize_html |> html_block_stats."""
    keep = _keep_sql("(u.s)", min_chars, num, den)
    return f"""WITH {_blocks_ctes()},
ex AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(blocks)),
           i -> struct_pack(bi := i, s := blocks[i]))) AS u
  FROM blk)
SELECT doc_id, CAST(u.bi - 1 AS BIGINT) AS block_idx,
       (u.s).txt AS block_text,
       CAST(length((u.s).txt) AS BIGINT) AS txt_len,
       CAST((u.s).lc AS BIGINT) AS link_chars,
       {keep} AS kept
FROM ex"""


# --------------------------------------------------------------------------
# Link extraction — the URL-graph side of a web pipeline (outlinks,
# internal/external split, per-domain counts for reputation signals).
# --------------------------------------------------------------------------

# the attribute name is anchored structurally (preceded by the tag
# name or a full attribute ending in whitespace) so data-href="u" or
# title="href=" cannot hijack the capture; RE2-safe, no lookbehind
HREF_RE = r'(?is)<a\s(?:[^>]*\s)?href="([^"]*)"'
DOMAIN_RE = r"(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)"


def extract_links(pages: DataFrame, html_col: str = "html",
                  id_col: str = "doc_id") -> DataFrame:
    """Outlink table: one row per double-quoted ``href`` in document
    order — (id, link_idx, href). Pure codegen (``regexp_extract_all``
    + posexplode); single-quoted/bare hrefs are out of scope for the
    RE2/Java common subset and documented as such. Pages with no
    links emit no rows."""
    return (pages.select(
        F.col(id_col),
        F.posexplode(F.regexp_extract_all(F.col(html_col),
                                          F.lit(HREF_RE), F.lit(1)))
        .alias("link_idx", "href")))


def link_stats(pages: DataFrame, html_col: str = "html",
               id_col: str = "doc_id") -> DataFrame:
    """Per-page outlink profile: total, distinct, internal (hrefs
    rooted at ``/``) and absolute (scheme-qualified) counts — the
    page-level link signals a crawl-frontier / quality stage consumes.
    All array ops over the extract, no shuffle."""
    links = F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE),
                                 F.lit(1))
    n_int = F.size(F.filter(links, lambda h: h.startswith("/")))
    n_abs = F.size(F.filter(
        links, lambda h: F.regexp_extract(h, DOMAIN_RE, 1) != ""))
    return pages.select(
        F.col(id_col),
        F.size(links).cast("long").alias("n_links"),
        F.size(F.array_distinct(links)).cast("long")
        .alias("n_unique"),
        n_int.cast("long").alias("n_internal"),
        n_abs.cast("long").alias("n_absolute"))


def link_domain_counts(pages: DataFrame, html_col: str = "html",
                       id_col: str = "doc_id",
                       links: DataFrame | None = None) -> DataFrame:
    """In-link counts per external domain of the NORMALIZED href
    (host case-folded, default port stripped — the same key the
    graph/frontier family uses): (domain, n_links, n_docs) — the raw
    material of a domain-reputation table (crawl-frontier
    prioritization, source weighting). One extract + one
    aggregation; relative links carry no domain and are excluded.
    Pass a prebuilt ``links`` table to reuse an existing extraction."""
    if links is None:
        links = extract_links(pages, html_col, id_col)
    d = (with_norm_url(links.select(id_col, "href"), "href")
         .select(id_col,
                 F.regexp_extract(F.col("norm_href"), DOMAIN_RE, 1)
                 .alias("domain")))
    return (d.where(F.col("domain") != "")
            .groupBy("domain")
            .agg(F.count("*").alias("n_links"),
                 F.countDistinct(id_col).alias("n_docs")))


def html_links_select() -> str:
    """DuckDB twin of synthesize_html |> extract_links."""
    return f"""WITH {_pages_ctes()},
hx AS (
  SELECT doc_id,
         regexp_extract_all(html, '{HREF_RE}', 1) AS hrefs
  FROM pages)
SELECT doc_id,
       CAST(u.i - 1 AS INT) AS link_idx,
       hrefs[u.i] AS href
FROM (SELECT doc_id, hrefs,
             unnest(generate_series(1, len(hrefs))) AS i
      FROM hx) u(doc_id, hrefs, i)"""


def link_domain_counts_select() -> str:
    """DuckDB twin of synthesize_html |> link_domain_counts (domain
    of the NORMALIZED href, matching the Spark side)."""
    return f"""WITH {_pages_ctes()},
dh AS (
  SELECT doc_id,
         unnest(regexp_extract_all(html, '{HREF_RE}', 1)) AS href
  FROM pages),
d AS (
  SELECT doc_id,
         regexp_extract({norm_url_sql('href')}, '{DOMAIN_RE}', 1)
           AS domain
  FROM dh)
SELECT domain, CAST(count(*) AS BIGINT) AS n_links,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM d WHERE domain <> '' GROUP BY 1"""


def link_stats_select() -> str:
    """DuckDB twin of synthesize_html |> link_stats (array-side like
    the engine, so zero-link pages would still emit a zero row)."""
    return f"""WITH {_pages_ctes()},
hx AS (
  SELECT doc_id,
         regexp_extract_all(html, '{HREF_RE}', 1) AS hrefs
  FROM pages)
SELECT doc_id,
       CAST(len(hrefs) AS BIGINT) AS n_links,
       CAST(len(list_distinct(hrefs)) AS BIGINT) AS n_unique,
       CAST(len(list_filter(hrefs, h -> h LIKE '/%')) AS BIGINT)
         AS n_internal,
       CAST(len(list_filter(hrefs,
              h -> regexp_extract(h, '{DOMAIN_RE}', 1) <> ''))
            AS BIGINT) AS n_absolute
FROM hx"""


# URL normalization (RFC 3986-lite), written ONCE as a SQL expression
# template valid in both Spark SQL (via F.expr) and DuckDB — the
# strongest form of the dual-dialect discipline (one tree, two
# engines). Rules: strip fragment; lowercase scheme and host; drop
# the scheme's default port (http:80 / https:443); empty path after
# an authority becomes '/'. Scheme-less (relative) URLs pass through
# fragment-stripped and trimmed; path dot-segment resolution and
# percent-encoding canonicalization are documented out of scope.
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def norm_url_sql(col: str) -> str:
    """SQL expression normalizing the URL in ``col`` (dual-dialect).

    Only the scheme and the HOST are case-folded: userinfo before a
    last ``@`` passes through untouched (credentials are
    case-sensitive), and the empty-path rule also fires when a query
    string directly follows the authority (``http://h?a=1`` and
    ``http://h/?a=1`` must key to one graph node)."""
    # outer trim: stripping a fragment can expose trailing whitespace
    # ("x #frag" -> "x ") — the idempotence property test pins this
    u = f"trim(regexp_replace(trim({col}), '(?s)#.*', ''))"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    auth = f"regexp_extract({u}, '{_SCHEME_RE}([^/?#]*)', 2)"
    userinfo = f"regexp_extract({auth}, '^(.*@)', 1)"  # up to last @
    hostport = f"lower(regexp_extract({auth}, '([^@]*)$', 1))"
    rest = f"regexp_replace({u}, '{_SCHEME_RE}[^/?#]*', '')"
    host = (f"CASE WHEN {scheme} = 'http' THEN "
            f"regexp_replace({hostport}, ':80$', '') "
            f"WHEN {scheme} = 'https' THEN "
            f"regexp_replace({hostport}, ':443$', '') "
            f"ELSE {hostport} END")
    path = (f"CASE WHEN {rest} = '' THEN '/' "
            f"WHEN substr({rest}, 1, 1) = '?' THEN '/' || {rest} "
            f"ELSE {rest} END")
    return (f"CASE WHEN {scheme} = '' THEN {u} "
            f"ELSE {scheme} || '://' || {userinfo} || {host} || {path} "
            f"END")


def with_norm_url(df: DataFrame, src_col: str,
                  out_col: str = "norm_href") -> DataFrame:
    """Staged-column twin of :func:`norm_url_sql`: identical fragment
    expressions (so results are bitwise the same), but each shared
    intermediate — the fragment-stripped URL, scheme, authority,
    path-rest, userinfo, host:port — is computed ONCE in its own
    projection step instead of being re-expanded everywhere it is
    referenced.

    Why: the single-expression form expands to ~31 regexp calls; when
    it becomes an aggregation key (``groupBy("norm_href")`` in the
    frontier), CollapseProject inlines the whole tree into the
    hash-aggregate's generated consume method, which blows the JVM's
    64 KB method limit ("Code grows beyond 64 KB",
    ``hashAgg_doAggregateWithKeys_0``) and silently drops the stage to
    interpreted execution. Staged intermediates are non-cheap and
    referenced more than once, so CollapseProject keeps them as
    separate projections: each regexp is evaluated once per row,
    codegen stays within method limits, and the aggregate's key is a
    small CASE over plain attributes."""
    p = f"_nu_{out_col}"
    u, sch, auth = f"{p}_u", f"{p}_scheme", f"{p}_auth"
    ui, hp, rest = f"{p}_userinfo", f"{p}_hostport", f"{p}_rest"
    df = df.withColumn(u, F.expr(
        f"trim(regexp_replace(trim({src_col}), '(?s)#.*', ''))"))
    df = (df.withColumn(sch, F.expr(
            f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"))
          .withColumn(auth, F.expr(
            f"regexp_extract({u}, '{_SCHEME_RE}([^/?#]*)', 2)"))
          .withColumn(rest, F.expr(
            f"regexp_replace({u}, '{_SCHEME_RE}[^/?#]*', '')")))
    df = (df.withColumn(ui, F.expr(
            f"regexp_extract({auth}, '^(.*@)', 1)"))
          .withColumn(hp, F.expr(
            f"lower(regexp_extract({auth}, '([^@]*)$', 1))")))
    host = (f"CASE WHEN {sch} = 'http' THEN "
            f"regexp_replace({hp}, ':80$', '') "
            f"WHEN {sch} = 'https' THEN "
            f"regexp_replace({hp}, ':443$', '') "
            f"ELSE {hp} END")
    path = (f"CASE WHEN {rest} = '' THEN '/' "
            f"WHEN substr({rest}, 1, 1) = '?' THEN '/' || {rest} "
            f"ELSE {rest} END")
    # shuffle() of a one-element array is a value- and type-identical
    # no-op, but it is flagged nondeterministic, so the optimizer may
    # neither inline this projection into a consumer nor substitute it
    # into a pushed-down filter predicate (guide §4.4's
    # asNondeterministic pattern, applied to a Column expression).
    # Without the fence, PushDownPredicates re-expanded the whole
    # normalization into every filter above it — observed as a
    # 180-regexp predicate pushed onto the links cache that blew the
    # 64 KB generated-method limit and dropped the stage to
    # interpreted execution.
    df = df.withColumn(out_col, F.shuffle(F.array(F.expr(
        f"CASE WHEN {sch} = '' THEN {u} "
        f"ELSE {sch} || '://' || {ui} || {host} || {path} END")))[0])
    return df.drop(u, sch, auth, ui, hp, rest)


def normalize_links(links: DataFrame,
                    href_col: str = "href") -> DataFrame:
    """Append ``norm_href`` to an outlink table — the canonical form
    URL-level dedup / graph building should key on."""
    return with_norm_url(links, href_col)


# --------------------------------------------------------------------------
# Page metadata extraction (title / html lang attribute / meta
# description) — the head-side signals a curation pipeline consumes:
# declared language feeds lang-ID reconciliation, title/description
# feed quality and dedup keys.
# --------------------------------------------------------------------------

TITLE_RE = r"(?is)<title(?:\s[^>]*)?>(.*?)</title\s*>"
LANG_RE = r'(?is)<html\s(?:[^>]*\s)?lang="([^"]*)"'
META_DESC_RE = (r'(?is)<meta\s(?:[^>]*\s)?name="description"'
                r'(?:\s[^>]*)?\scontent="([^"]*)"')


def extract_page_meta(pages: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, title, lang_attr, meta_description): first <title> text
    (tag-stripped, entity-decoded, whitespace-collapsed), the <html>
    lang attribute, and the name-then-content form of the description
    meta tag; absent fields come back as empty strings (the
    regexp_extract no-match convention in both engines)."""
    h = F.col(html_col)
    return pages.select(
        F.col(id_col),
        _txt_col(F.regexp_extract(h, TITLE_RE, 1)).alias("title"),
        F.regexp_extract(h, LANG_RE, 1).alias("lang_attr"),
        _txt_col(F.regexp_extract(h, META_DESC_RE, 1))
        .alias("meta_description"))


def html_meta_select() -> str:
    """DuckDB twin of synthesize_html |> extract_page_meta."""
    title = _txt_sql(f"regexp_extract(html, '{TITLE_RE}', 1)")
    desc = _txt_sql(f"regexp_extract(html, '{META_DESC_RE}', 1)")
    return f"""WITH {_pages_ctes()}
SELECT doc_id, {title} AS title,
       regexp_extract(html, '{LANG_RE}', 1) AS lang_attr,
       {desc} AS meta_description
FROM pages"""


# --------------------------------------------------------------------------
# Anchor-text extraction + target-side index — the classic web-graph
# retrieval signal (anchor text describes the TARGET page better than
# the target's own text; Brin & Page 1998 section 2.2). Whole-anchor
# matches keep href and text aligned by construction (two parallel
# single-group extract_alls could desynchronize on href-less anchors).
# --------------------------------------------------------------------------

ANCHOR_FULL_RE = r'(?is)<a\s(?:[^>]*\s)?href="[^"]*"[^>]*>.*?</a\s*>'


def extract_anchors(pages: DataFrame, html_col: str = "html",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, link_idx, href, anchor_text): every href-bearing anchor in
    document order with its visible (tag-stripped, entity-decoded)
    text. Pure codegen: one whole-anchor extract_all, then per-element
    href/text projection inside the array."""
    anchors = F.regexp_extract_all(F.col(html_col),
                                   F.lit(ANCHOR_FULL_RE), F.lit(0))
    pairs = F.transform(anchors, lambda a: F.struct(
        F.regexp_extract(a, HREF_RE, 1).alias("href"),
        _txt_col(a).alias("anchor_text")))
    return (pages.select(F.col(id_col),
                         F.posexplode(pairs).alias("link_idx", "u"))
            .select(id_col, "link_idx", "u.href", "u.anchor_text"))


def anchor_text_index(anchors: DataFrame,
                      id_col: str = "doc_id") -> DataFrame:
    """Target-side anchor index over NORMALIZED targets: per
    norm_href, the number of anchors, the number of distinct referring
    docs, and the sorted distinct anchor texts joined with '|' — the
    aggregation a retrieval/reputation stage keys on. One aggregation
    after the codegen normalize; deterministic (sorted set join)."""
    n = with_norm_url(anchors, "href")
    return (n.groupBy("norm_href")
            .agg(F.count("*").alias("n_anchors"),
                 F.countDistinct(id_col).alias("n_docs"),
                 F.array_join(F.array_sort(
                     F.collect_set("anchor_text")), "|")
                 .alias("texts")))


def extract_anchors_select() -> str:
    """DuckDB twin of synthesize_html |> extract_anchors."""
    t = _txt_sql("an[u.i]")
    return f"""WITH {_pages_ctes()},
ax AS (
  SELECT doc_id,
         regexp_extract_all(html, '{ANCHOR_FULL_RE}', 0) AS an
  FROM pages)
SELECT doc_id, CAST(u.i - 1 AS INT) AS link_idx,
       regexp_extract(an[u.i], '{HREF_RE}', 1) AS href,
       {t} AS anchor_text
FROM (SELECT doc_id, an, unnest(generate_series(1, len(an))) AS i
      FROM ax) u(doc_id, an, i)"""


def anchor_text_index_select() -> str:
    """DuckDB twin of extract_anchors |> anchor_text_index."""
    return f"""WITH anch AS ({extract_anchors_select()})
SELECT {norm_url_sql('href')} AS norm_href,
       CAST(count(*) AS BIGINT) AS n_anchors,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       array_to_string(list_sort(list_distinct(list(anchor_text))),
                       '|') AS texts
FROM anch GROUP BY 1"""


def extract_and_normalize(pages: DataFrame,
                          min_doc_chars: int = 100,
                          site_template: bool = False) -> DataFrame:
    """Stage 1 of both web drivers (plans.web batch, streaming.web
    incremental), defined ONCE so their funnels cannot drift: extract
    main text, drop pages with fewer than ``min_doc_chars`` kept
    chars, normalize, keep the extraction stats.

    With ``site_template=True`` the :func:`site_boilerplate`
    cross-document template pass runs after the per-page rule (the
    CCNet-style second pass), so per-site repeated blocks vanish from
    the corpus before any downstream hashing sees them. Stats then
    count the post-template kept blocks (n_blocks/chars_dropped keep
    their per-page meaning).

    Output: (doc_id, source, text, n_blocks, n_kept, n_dropped,
    chars_kept, chars_dropped)."""
    from maps_spark.operators.text import normalize_text
    if site_template:
        # one HTML parse: text AND stats come from the site pass's
        # persisted block table (no second extract_main_text scan)
        ex = _site_clean_full(pages, "html", "doc_id", "source",
                              1, 2, 2).withColumnRenamed(
            "text", "main_text")
    else:
        ex = extract_main_text(pages)
    thick = ex.where((F.col("n_kept") >= 1) &
                     (F.col("chars_kept") >= min_doc_chars))
    norm = normalize_text(
        thick.select("doc_id", F.col("main_text").alias("text")))
    return (thick.drop("main_text")
            .join(norm.select("doc_id",
                              F.col("norm_text").alias("text")),
                  "doc_id")
            .join(pages.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", "text", "n_blocks", "n_kept",
                    "n_dropped", "chars_kept", "chars_dropped"))


def _links_with_source(pages: DataFrame, html_col: str = "html",
                       id_col: str = "doc_id",
                       source_col: str = "source") -> DataFrame:
    """Shared (id, link_idx, href, source) outlink projection — built
    once and passed into the graph/frontier helpers so composite
    operators parse each page's HTML a single time."""
    return extract_links(pages, html_col, id_col).join(
        pages.select(id_col, source_col), id_col)


def site_domain_edges(pages: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id",
                      source_col: str = "source",
                      links: DataFrame | None = None) -> DataFrame:
    """(src, dst) edges of the site->domain link graph: one edge per
    absolute outlink, src = the referring page's source site, dst =
    the linked domain of the NORMALIZED href (host case-folded,
    default port stripped) so graph nodes key identically to the
    frontier's norm_href-derived domains — mixed-case or :80 forms
    of one domain never split rank mass across two nodes."""
    if links is None:
        links = _links_with_source(pages, html_col, id_col, source_col)
    normed = with_norm_url(
        links.select(F.col(source_col).alias("src"), "href"), "href")
    dst = F.regexp_extract(F.col("norm_href"), DOMAIN_RE, 1)
    return (normed.select("src", dst.alias("dst"))
            .where(F.col("dst") != ""))


def candidate_refs(pages: DataFrame, html_col: str = "html",
                   id_col: str = "doc_id",
                   source_col: str = "source",
                   links: DataFrame | None = None) -> DataFrame:
    """(id, norm_href): every outlink instance resolved to an
    absolute normalized URL (site-relative against the page's source;
    opaque hrefs drop) — the pre-anti-join half of
    :func:`frontier_candidates`, reusable incrementally because it is
    a pure per-page projection."""
    if links is None:
        links = _links_with_source(pages, html_col, id_col, source_col)
    abs_href = (
        F.when(F.regexp_extract("href", DOMAIN_RE, 1) != "",
               F.col("href"))
        .when(F.col("href").startswith("/"),
              F.concat(F.lit("http://"), F.col(source_col),
                       F.col("href"))))
    return with_norm_url(
        links.select(F.col(id_col), abs_href.alias("abs_href"))
        .where(F.col("abs_href").isNotNull()), "abs_href"
    ).select(id_col, "norm_href")


def page_urls(pages: DataFrame, id_col: str = "doc_id",
              source_col: str = "source") -> DataFrame:
    """(norm_href): each page's canonical crawled URL
    ``http://<source>/doc/<id>``, normalized — the seen set the
    frontier anti-joins against."""
    return (with_norm_url(pages.select(
        F.concat(F.lit("http://"), F.col(source_col), F.lit("/doc/"),
                 F.col(id_col).cast("string")).alias("page_url")),
        "page_url")
        .select("norm_href").distinct())


def site_domain_edges_select() -> str:
    """The site->domain edges query over the synthesized pages — the
    single SQL twin of :func:`site_domain_edges`, shared by every
    graph oracle (PageRank, HITS, reputation, frontier) so edge
    semantics can never drift between them."""
    return f"""WITH {_pages_ctes()},
lx AS (
  SELECT source,
         unnest(regexp_extract_all(html, '{HREF_RE}', 1)) AS href
  FROM pages),
ld AS (
  SELECT source AS src,
         regexp_extract({norm_url_sql('href')}, '{DOMAIN_RE}', 1)
           AS dst
  FROM lx)
SELECT src, dst FROM ld WHERE dst <> ''"""


def domain_reputation(pages: DataFrame, html_col: str = "html",
                      id_col: str = "doc_id",
                      source_col: str = "source",
                      iters: int = 3) -> DataFrame:
    """The web-graph reputation artifact a crawl frontier / source
    weighter consumes: per external domain, its in-link volume
    (n_links), referring-doc breadth (n_docs) and exact-integer
    PageRank over the site->domain graph — one joined table from two
    individually-gated operators.

    Output: (domain, n_links, n_docs, rank_scaled)."""
    from maps_spark.operators.graph import pagerank
    links = _persist_transient(_links_with_source(
        pages, html_col, id_col, source_col))
    edges = site_domain_edges(pages, html_col, id_col, source_col,
                              links)
    pr = pagerank(edges, iters=iters).select(
        F.col("node").alias("domain"), "rank_scaled")
    counts = link_domain_counts(pages, html_col, id_col, links)
    return counts.join(pr, "domain")


def domain_reputation_select(iters: int = 3) -> str:
    """DuckDB twin of domain_reputation (composes the pagerank and
    domain-count oracles over the synthesized pages)."""
    from maps_spark.operators.graph import pagerank_select
    pr = pagerank_select(site_domain_edges_select(), iters=iters)
    return f"""WITH pr AS ({pr}),
dc AS ({link_domain_counts_select()})
SELECT dc.domain, dc.n_links, dc.n_docs,
       CAST(pr.rank_scaled AS BIGINT) AS rank_scaled
FROM dc JOIN pr ON pr.node = dc.domain"""


def frontier_candidates(pages: DataFrame, html_col: str = "html",
                        id_col: str = "doc_id",
                        source_col: str = "source",
                        pr_iters: int = 3) -> DataFrame:
    """The crawl scheduler's next fetch list: every outlink resolved
    to an absolute URL (site-relative hrefs resolve against the
    page's source site; opaque non-URL hrefs like mailto: drop),
    normalized with :func:`norm_url_sql`, anti-joined against the
    already-crawled set (each page's own canonical URL
    ``http://<source>/doc/<id>``, the same convention the pages'
    next-digest links use), then aggregated per candidate URL and
    scored with the link-graph PageRank of its domain.

    Scale shape: the anti-join and the reference aggregation share
    one shuffle key (norm_href); the PageRank table is domains-only,
    broadcast into the final join. At full corpus scale the seen set
    is this same query's pages table — no driver-side state.

    Output: (norm_href, domain, n_refs, n_ref_docs, domain_rank)."""
    # one shared (and cached) outlink projection feeds both the refs
    # and the edges branch, so each page's HTML is parsed once — the
    # links table is hrefs-only, far smaller than the pages it came
    # from, so persisting it is the right trade at corpus scale
    links = _persist_transient(_links_with_source(
        pages, html_col, id_col, source_col))
    return frontier_assemble(
        candidate_refs(pages, html_col, id_col, source_col, links),
        page_urls(pages, id_col, source_col),
        site_domain_edges(pages, html_col, id_col, source_col, links),
        id_col, pr_iters)


def frontier_assemble(refs: DataFrame, seen: DataFrame,
                      edges: DataFrame, id_col: str = "doc_id",
                      pr_iters: int = 3,
                      prior_ranks: DataFrame | None = None,
                      ranks: DataFrame | None = None) -> DataFrame:
    """Final frontier assembly from its three persistable inputs
    (link-reference instances, crawled URLs, site->domain edges) —
    shared verbatim by the one-shot :func:`frontier_candidates` and
    the streaming store's read path, so the two can never drift.

    ``prior_ranks`` warm-starts the PageRank refresh from a previous
    build's (node, rank_scaled) table (see
    :func:`operators.graph.pagerank`); the gate path leaves it None so
    results stay cold-start deterministic. ``ranks`` short-circuits
    the PageRank entirely with a precomputed (node, rank_scaled)
    table — the crawl driver computes ranks once, persists them for
    the next round's warm start, and reuses the same table here. The
    rank table is broadcast only while it is genuinely small
    (``BROADCAST_MAX_ROWS``) — above that it joins by shuffle on the
    exact domain key."""
    from maps_spark.operators.graph import pagerank
    agg = (refs.join(seen, "norm_href", "left_anti")
           .groupBy("norm_href")
           .agg(F.count("*").alias("n_refs"),
                F.countDistinct(id_col).alias("n_ref_docs")))
    if ranks is None:
        ranks = pagerank(edges, iters=pr_iters, warm_start=prior_ranks)
    pr = ranks.withColumnRenamed("node", "domain")
    return (agg.withColumn("domain",
                           F.regexp_extract("norm_href", DOMAIN_RE, 1))
            .join(_broadcast_if_small(pr), "domain", "left")
            .select("norm_href", "domain", "n_refs", "n_ref_docs",
                    F.coalesce("rank_scaled", F.lit(0)).cast("long")
                    .alias("domain_rank")))


def frontier_candidates_select(pr_iters: int = 3) -> str:
    """DuckDB twin of frontier_candidates over the synthesized
    pages (shares the verbatim norm_url_sql expression and the
    unrolled pagerank oracle)."""
    from maps_spark.operators.graph import pagerank_select
    edges = site_domain_edges_select()
    page_url = "'http://' || source || '/doc/' || CAST(doc_id AS STRING)"
    return f"""WITH {_pages_ctes()},
lk AS (
  SELECT doc_id, source,
         unnest(regexp_extract_all(html, '{HREF_RE}', 1)) AS href
  FROM pages),
res AS (
  SELECT doc_id,
         CASE WHEN regexp_extract(href, '{DOMAIN_RE}', 1) <> ''
                THEN href
              WHEN href LIKE '/%' THEN 'http://' || source || href
              ELSE NULL END AS abs_href
  FROM lk),
cand AS (
  SELECT doc_id, {norm_url_sql('abs_href')} AS norm_href
  FROM res WHERE abs_href IS NOT NULL),
seen AS (
  SELECT DISTINCT {norm_url_sql(page_url)} AS norm_href FROM pages),
agg AS (
  SELECT norm_href, CAST(count(*) AS BIGINT) AS n_refs,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ref_docs
  FROM cand
  WHERE norm_href NOT IN (SELECT norm_href FROM seen)
  GROUP BY 1),
pr AS ({pagerank_select(edges, iters=pr_iters)})
SELECT agg.norm_href,
       regexp_extract(agg.norm_href, '{DOMAIN_RE}', 1) AS domain,
       n_refs, n_ref_docs,
       CAST(COALESCE(pr.rank_scaled, 0) AS BIGINT) AS domain_rank
FROM agg LEFT JOIN pr
  ON pr.node = regexp_extract(agg.norm_href, '{DOMAIN_RE}', 1)"""


def frontier_shards(cand: DataFrame, per_host_cap: int = 5,
                    n_shards: int = 8) -> DataFrame:
    """Politeness-sharded fetch plan over a
    :func:`frontier_candidates` table: each host keeps at most
    ``per_host_cap`` URLs (most-referenced first, ties broken by
    breadth then URL so the cut is deterministic), and every kept URL
    lands in shard ``poly_hash(domain) % n_shards`` — all of a host's
    fetches ride one shard, so per-host rate limits are local to one
    worker and no cross-shard coordination exists.

    The window partitions by domain (bounded by the cap right after
    ranking), and the shard key is the same 31-bit polynomial string
    hash the hashing-trick vectors use (`token_hash_col`) — pure
    codegen, oracle-identical.

    Output: (norm_href, domain, host_rank, shard, n_refs,
    n_ref_docs, domain_rank)."""
    from pyspark.sql import Window
    from maps_spark.operators.similarity import token_hash_col
    w = (Window.partitionBy("domain")
         .orderBy(F.desc("n_refs"), F.desc("n_ref_docs"), "norm_href"))
    # protocol-layer provenance columns ride through when the caller
    # (the crawl loop) attached them; the gate path has neither, so
    # the gate-proven output is byte-identical
    extra = [c for c in ("via", "next_delay_s") if c in cand.columns]
    return (cand.withColumn("host_rank",
                            F.row_number().over(w).cast("long"))
            .where(F.col("host_rank") <= per_host_cap)
            .select("norm_href", "domain", "host_rank",
                    (token_hash_col(F.col("domain")) % n_shards)
                    .cast("long").alias("shard"),
                    "n_refs", "n_ref_docs", "domain_rank", *extra))


def frontier_shards_select(per_host_cap: int = 5,
                           n_shards: int = 8,
                           pr_iters: int = 3) -> str:
    """DuckDB twin of frontier_candidates |> frontier_shards."""
    from maps_spark.sql.oracle_training import _TOKEN_HASH
    return f"""WITH fc AS ({frontier_candidates_select(pr_iters)}),
rk AS (
  SELECT *, domain AS t,
         CAST(row_number() OVER (
             PARTITION BY domain
             ORDER BY n_refs DESC, n_ref_docs DESC, norm_href)
           AS BIGINT) AS host_rank
  FROM fc)
SELECT norm_href, domain, host_rank,
       CAST(({_TOKEN_HASH}) % {n_shards} AS BIGINT) AS shard,
       n_refs, n_ref_docs, domain_rank
FROM rk WHERE host_rank <= {per_host_cap}"""


# Path of a normalized URL: everything after the authority ('' -> '/').
_URL_PATH_STRIP = r"^[a-z][a-z0-9+.-]*://[^/?#]*"


def synthesize_robots(pages: DataFrame, id_col: str = "doc_id",
                      source_col: str = "source") -> DataFrame:
    """Deterministic robots rules for the synthesized web: every
    source site disallows /buy and /t/ (its ad and trending paths),
    and every even-numbered partner domain disallows /ref — so the
    filter exercises internal paths, external domains, and
    unmatched-domain passthrough. Output: (domain, disallow)."""
    s = pages.select(F.col(source_col).alias("domain")).distinct()
    ks = (pages.select((F.col(id_col) % 7).alias("k")).distinct()
          .where(F.col("k") % 2 == 0))
    return (s.select("domain", F.lit("/buy").alias("disallow"))
            .unionByName(
                s.select("domain", F.lit("/t/").alias("disallow")))
            .unionByName(ks.select(
                F.concat(F.lit("partner"), F.col("k").cast("string"),
                         F.lit(".example")).alias("domain"),
                F.lit("/ref").alias("disallow"))))


def apply_robots(cand: DataFrame, rules: DataFrame) -> DataFrame:
    """Filter a :func:`frontier_candidates` table by robots disallow
    rules (original-spec semantics: any matching path prefix for the
    URL's domain blocks it; domains with no rules pass). The rules
    join is domain-keyed and rules tables are rule-count-bounded, so
    the candidate side shuffles once on domain and the blocked set
    semi-joins back — never a per-rule scan of the corpus. Rule
    domains are case-folded to the candidate side's normalized
    (lowercase) domain key; paths stay case-sensitive per the
    robots spec."""
    path = F.regexp_replace(F.col("norm_href"), _URL_PATH_STRIP, "")
    rules = rules.select(F.lower("domain").alias("domain"), "disallow")
    blocked = (cand.select(
        "norm_href", "domain",
        F.when(path == "", "/").otherwise(path).alias("path"))
        .join(rules, "domain")
        .where(F.col("path").startswith(F.col("disallow")))
        .select("norm_href").distinct())
    return cand.join(blocked, "norm_href", "left_anti")


def robots_filter_select(pr_iters: int = 3) -> str:
    """DuckDB twin of frontier_candidates |> apply_robots with the
    synthesized rules."""
    return f"""WITH {_pages_ctes()},
fc AS ({frontier_candidates_select(pr_iters)}),
rules AS (
  SELECT lower(domain) AS domain, disallow FROM (
    SELECT domain, disallow FROM
      (SELECT DISTINCT source AS domain FROM pages) s
    CROSS JOIN (VALUES ('/buy'), ('/t/')) v(disallow)
    UNION ALL
    SELECT 'partner' || CAST(k AS VARCHAR) || '.example', '/ref'
    FROM (SELECT DISTINCT doc_id % 7 AS k FROM pages) kk
    WHERE k % 2 = 0) raw),
pth AS (
  SELECT norm_href, domain,
         CASE WHEN regexp_replace(norm_href,
                '{_URL_PATH_STRIP}', '') = '' THEN '/'
              ELSE regexp_replace(norm_href, '{_URL_PATH_STRIP}', '')
         END AS path
  FROM fc),
blk AS (
  SELECT DISTINCT norm_href
  FROM pth JOIN rules USING (domain)
  WHERE starts_with(path, disallow))
SELECT norm_href, domain, n_refs, n_ref_docs, domain_rank
FROM fc WHERE norm_href NOT IN (SELECT norm_href FROM blk)"""


# --------------------------------------------------------------------------
# Site-level template removal — the second boilerplate pass a real web
# pipeline runs after the per-page link-density rule (CCNet-style
# cross-document repetition): blocks that recur across a large
# fraction of one site's pages are template (nav text, footers, long
# link-free "about" blurbs the per-page rule cannot catch) and are
# stripped from every page of that site.
# --------------------------------------------------------------------------


def site_boilerplate(pages: DataFrame, html_col: str = "html",
                     id_col: str = "doc_id",
                     source_col: str = "source",
                     num: int = 1, den: int = 2,
                     min_pages: int = 2) -> DataFrame:
    """Blocks occurring on at least ``num/den`` of a site's pages
    (and at least ``min_pages`` absolute): the site's template set.

    Integer rule (``n_pages * den >= site_pages * num``), counts are
    distinct pages. One (source, block_text) aggregation — at corpus
    scale the shuffle key is the block text, whose distinct-per-site
    cardinality is page-bounded, and the output is tiny (the
    template set), which downstream strips consume as a broadcast.

    Output: (source, block_text, n_pages, site_pages)."""
    blocks = (html_block_stats(pages, html_col, id_col)
              .join(pages.select(id_col, source_col), id_col))
    return _site_boilerplate_from_blocks(pages, blocks, id_col,
                                         source_col, num, den,
                                         min_pages)


def _site_boilerplate_from_blocks(pages: DataFrame, blocks: DataFrame,
                                  id_col: str, source_col: str,
                                  num: int, den: int,
                                  min_pages: int) -> DataFrame:
    """Template detection over a prebuilt per-block table, so callers
    that also need the blocks (the two-pass extractor) parse each
    page's HTML once."""
    per = (blocks.groupBy(source_col, "block_text")
           .agg(F.countDistinct(id_col).alias("n_pages")))
    site = (pages.groupBy(source_col)
            .agg(F.countDistinct(id_col).alias("site_pages")))
    return (per.join(site, source_col)
            .where((F.col("n_pages") >= min_pages) &
                   (F.col("n_pages") * den >=
                    F.col("site_pages") * num))
            .select(F.col(source_col).alias("source"), "block_text",
                    "n_pages", "site_pages"))


def extract_site_clean(pages: DataFrame, html_col: str = "html",
                       id_col: str = "doc_id",
                       source_col: str = "source",
                       num: int = 1, den: int = 2,
                       min_pages: int = 2) -> DataFrame:
    """Two-pass main-text extraction: the per-page keep rule
    (length + link density) first, then the :func:`site_boilerplate`
    template set subtracted — per-source template blocks vanish from
    every page even when they pass the per-page rule. The template
    set is broadcast; pages with nothing left emit an empty text row
    (left join back to the page list), so row count is stable.

    Output: (id, text, n_kept)."""
    return _site_clean_full(pages, html_col, id_col, source_col,
                            num, den, min_pages).select(
        id_col, "text", "n_kept")


def _site_clean_full(pages: DataFrame, html_col: str,
                     id_col: str, source_col: str,
                     num: int, den: int, min_pages: int) -> DataFrame:
    """extract_site_clean plus the per-page extraction stats, ALL
    derived from one persisted block table so the HTML parse runs
    once (n_blocks / n_dropped / chars_dropped keep their per-page
    meaning; n_kept / chars_kept count post-template blocks).

    Output: (id, text, n_kept, n_blocks, n_dropped, chars_kept,
    chars_dropped)."""
    # one cached block table feeds the template aggregation, the
    # per-page strip AND the stats — the 9-regex-per-block HTML
    # parse runs once
    blocks = _persist_transient(
        html_block_stats(pages, html_col, id_col)
        .join(pages.select(id_col, source_col), id_col))
    bl = (_site_boilerplate_from_blocks(pages, blocks, id_col,
                                        source_col, num, den,
                                        min_pages)
          .select(F.col("source").alias("_bp_source"),
                  F.col("block_text").alias("_bp_text"),
                  F.lit(True).alias("_bp"))
          # materialize the (tiny) template set once: the broadcast
          # guard's count and the strip join both read it, and the
          # aggregation it comes from would otherwise run twice
          .localCheckpoint())
    kept = (blocks.where(F.col("kept"))
            .join(_broadcast_if_small(bl),
                  (F.col(source_col) == F.col("_bp_source")) &
                  (F.col("block_text") == F.col("_bp_text")), "left")
            .where(F.col("_bp").isNull()))
    agg = (kept.groupBy(id_col)
           .agg(F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("block_idx", "block_text"))),
                        lambda s: s["block_text"]), "\n").alias("text"),
                F.count("*").alias("n_kept"),
                F.sum(F.length("block_text")).cast("long")
                .alias("chars_kept")))
    page = (blocks.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_blocks"),
                 F.sum(F.when(F.col("kept"), 0).otherwise(1))
                 .cast("long").alias("n_dropped"),
                 F.sum(F.when(F.col("kept"), 0)
                       .otherwise(F.col("txt_len")))
                 .cast("long").alias("chars_dropped")))
    return (pages.select(id_col)
            .join(agg, id_col, "left").join(page, id_col, "left")
            .select(id_col,
                    F.coalesce("text", F.lit("")).alias("text"),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.coalesce("n_blocks", F.lit(0)).cast("long")
                    .alias("n_blocks"),
                    F.coalesce("n_dropped", F.lit(0)).cast("long")
                    .alias("n_dropped"),
                    F.coalesce("chars_kept", F.lit(0)).cast("long")
                    .alias("chars_kept"),
                    F.coalesce("chars_dropped", F.lit(0)).cast("long")
                    .alias("chars_dropped")))


def _site_blocks_ctes() -> str:
    """CTE chain adding ``sx(doc_id, source, block_idx, block_text,
    kept)`` over the synthesized pages."""
    keep = _keep_sql("(u.s)", MIN_BLOCK_CHARS, LINK_NUM, LINK_DEN)
    return f"""{_blocks_ctes()},
sx AS (
  SELECT blk.doc_id, pages.source,
         CAST(u.bi - 1 AS BIGINT) AS block_idx,
         (u.s).txt AS block_text,
         {keep} AS kept
  FROM blk JOIN pages USING (doc_id),
       LATERAL (SELECT unnest(list_transform(
                  generate_series(1, len(blocks)),
                  i -> struct_pack(bi := i, s := blocks[i]))) AS u) l)"""


def site_boilerplate_select(num: int = 1, den: int = 2,
                            min_pages: int = 2) -> str:
    """DuckDB twin of synthesize_html |> site_boilerplate."""
    return f"""WITH {_site_blocks_ctes()},
per AS (
  SELECT source, block_text,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages
  FROM sx GROUP BY 1, 2),
site AS (
  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS site_pages
  FROM pages GROUP BY 1)
SELECT per.source, block_text, n_pages, site_pages
FROM per JOIN site USING (source)
WHERE n_pages >= {min_pages} AND n_pages * {den} >= site_pages * {num}"""


def extract_site_clean_select(num: int = 1, den: int = 2,
                              min_pages: int = 2) -> str:
    """DuckDB twin of synthesize_html |> extract_site_clean."""
    return f"""WITH {_site_blocks_ctes()},
per AS (
  SELECT source, block_text,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages
  FROM sx GROUP BY 1, 2),
site AS (
  SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS site_pages
  FROM pages GROUP BY 1),
bp AS (
  SELECT per.source, block_text
  FROM per JOIN site USING (source)
  WHERE n_pages >= {min_pages}
    AND n_pages * {den} >= site_pages * {num}),
kept AS (
  SELECT sx.doc_id, sx.block_idx, sx.block_text
  FROM sx
  WHERE sx.kept AND NOT EXISTS (
    SELECT 1 FROM bp
    WHERE bp.source = sx.source
      AND bp.block_text = sx.block_text)),
agg AS (
  SELECT doc_id,
         string_agg(block_text, chr(10) ORDER BY block_idx) AS text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY 1)
SELECT pages.doc_id,
       COALESCE(agg.text, '') AS text,
       COALESCE(agg.n_kept, 0) AS n_kept
FROM pages LEFT JOIN agg USING (doc_id)"""


# Tracking parameters every public canonicalization list strips
# (utm_* campaign tags + the big click-id params). Kept RE2/Java
# common: inline (?i) at the start, no lookaround.
# A WHOLE query parameter is tracking iff its name is utm_* or one of
# the click ids — anchored ^...$ over the split param, so gclidx=2 or
# fbclid2=9 are NOT tracking (name-boundary without lookahead, which
# RE2 lacks; an earlier '&'-prefix global-replace form corrupted
# adjacent params and is pinned by regression cases).
TRACKING_PARAM_RE = (r"(?i)^(utm_[^&=#]*|gclid|fbclid|msclkid|mc_eid)"
                     r"(=.*)?$")


def canon_href_col(href_col: str) -> Column:
    """Canonical URL Column: :func:`norm_url_sql` normalization, then
    tracking parameters removed from the query string (the query is
    detached, split on '&', params whose NAME matches the tracking
    list are dropped, the rest re-join in order — re-attached only
    if something survives, so '?utm_only=1' URLs lose the '?'
    entirely). Pure codegen.

    ``pre`` is trimmed: dropping the query can expose trailing
    whitespace ("0 ?" -> "0 ") exactly like the fragment case in
    norm_url_sql — the idempotence property test found both."""
    u = F.expr(norm_url_sql(href_col))
    pre = F.trim(F.regexp_replace(u, r"\?[^#]*", ""))
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    qq = F.array_join(
        F.filter(F.split(q, "&"),
                 lambda p: ~p.rlike(TRACKING_PARAM_RE)), "&")
    return F.when(qq == "", pre).otherwise(
        F.concat(pre, F.lit("?"), qq))


def with_canon_href(df: DataFrame, src_col: str,
                    out_col: str = "canon_href") -> DataFrame:
    """Staged-column twin of :func:`canon_href_col` (same expressions,
    so results are bitwise identical): the normalized URL comes from
    :func:`with_norm_url` (computed ONCE, behind its inlining fence)
    and the detached query / surviving-params fragments are their own
    projections, so the plan carries small attribute references
    instead of re-expanding the ~31-regexp normalization at every use
    (the 8 KB plan line the single-expression form produced — the
    last holdout of the r10 URL-family staging)."""
    p = f"_ch_{out_col}"
    u, pre, q, qq = f"{p}_u", f"{p}_pre", f"{p}_q", f"{p}_qq"
    df = with_norm_url(df, src_col, out_col=u)
    df = (df.withColumn(pre, F.trim(
              F.regexp_replace(F.col(u), r"\?[^#]*", "")))
          .withColumn(q, F.regexp_extract(F.col(u), r"\?([^#]*)", 1)))
    df = df.withColumn(qq, F.array_join(
        F.filter(F.split(F.col(q), "&"),
                 lambda x: ~x.rlike(TRACKING_PARAM_RE)), "&"))
    df = df.withColumn(out_col,
                       F.when(F.col(qq) == "", F.col(pre))
                       .otherwise(F.concat(F.col(pre), F.lit("?"),
                                           F.col(qq))))
    return df.drop(u, pre, q, qq)


def canonicalize_links(links: DataFrame,
                       href_col: str = "href") -> DataFrame:
    """Append ``canon_href`` — the URL-dedup / graph key stronger
    than plain normalization: two shares of one article that differ
    only by campaign tags collapse to one node."""
    return with_canon_href(links, href_col)


def canon_href_sql(col: str) -> str:
    """DuckDB twin of :func:`canon_href_col` (same split-filter-join
    over anchored param names)."""
    u = norm_url_sql(col)
    pre = f"trim(regexp_replace({u}, '\\?[^#]*', ''))"
    q = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    # COALESCE: DuckDB's array_to_string of an EMPTY list is NULL,
    # Spark's array_join is '' — fold to the Spark convention
    qq = (f"COALESCE(array_to_string(list_filter("
          f"string_split({q}, '&'), "
          f"p -> NOT regexp_matches(p, '{TRACKING_PARAM_RE}')), "
          f"'&'), '')")
    return (f"CASE WHEN {qq} = '' THEN {pre} "
            f"ELSE {pre} || '?' || {qq} END")
