"""Crawl-policy and page-metadata operators: the screens a web-corpus
pipeline runs BETWEEN fetching and per-document quality filtering.

Reference analog: kneaddata decides keep/drop from per-read metadata and
contaminant-database verdicts before any content transform runs
(run.py:53-185 database gates; utilities.py:537-574 format-validity
gates). Here the "databases" are the crawl's own metadata surfaces —
page <head> metadata, robots.txt policy, domain-level yield — and the
verdicts gate documents before the text screens pay to run.

Spark-first shapes, all audited for 100 TB:
 - html_meta / soft404_screen: pure JVM regex/Column algebra — one
   whole-stage-codegen project, zero Python, zero shuffles.
 - robots_filter: rules are per-host and tiny next to the URL table —
   broadcast join + ONE map-side-combinable max() agg; longest-match
   resolution is integer arithmetic, never a window.
 - domain_quality_card: combinable sums per domain; the shuffle carries
   only the reduced card (domains << pages).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import rules

# shared regex subset only (inline flags, non-greedy, [^>] classes) so the
# DuckDB/RE2 oracle replicas run the same patterns verbatim
TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
H1_RE = r"(?is)<h1[^>]*>(.*?)</h1>"
LANG_ATTR_RE = r'(?i)<html[^>]* lang="([^"]*)"'
P_OPEN_RE = r"(?i)<p[ >]"
URL_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
URL_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)"


def _decode_entities(col: Column) -> Column:
    """Minimal single-pass entity decode (same ordered table as
    htmlextract._ENTITIES — &amp; last, the html5 single-pass rule)."""
    from .htmlextract import _ENTITIES

    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def html_meta(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Page <head>/chrome metadata card: entity-decoded <title> and first
    <h1> text, the declared `<html lang="...">` attribute ('' when the
    page declares none), and the paragraph count. The routing surface a
    crawl pipeline reads before extracting anything — titles feed the
    soft-404 screen, lang feeds language bucketing."""
    h = F.col(html_col)
    return df.select(
        F.col(id_col),
        _decode_entities(F.trim(F.regexp_extract(h, TITLE_RE, 1))).alias("title"),
        _decode_entities(F.trim(F.regexp_extract(h, H1_RE, 1))).alias("h1"),
        F.regexp_extract(h, LANG_ATTR_RE, 1).alias("lang_attr"),
        F.size(F.regexp_extract_all(h, F.lit(P_OPEN_RE), 0))
        .cast("long")
        .alias("n_paras"),
    )


def lang_meta_screen(
    meta: DataFrame, catalog: DataFrame, id_col: str, lang_col: str = "lang"
) -> DataFrame:
    """Declared-vs-catalog language consistency: join the page's declared
    lang attribute against the catalog language and rule each document
    'match' / 'mismatch' / 'missing' (rules.py taxonomy). A mismatch
    mis-buckets the document in every downstream per-language mixture.
    One equi-join on the id (broadcast-eligible when the meta side is a
    sampled audit slice); the verdict is a CASE, never Python."""
    j = meta.select(id_col, "lang_attr").join(
        catalog.select(id_col, F.col(lang_col).alias("catalog_lang")), id_col
    )
    return j.select(
        id_col,
        "lang_attr",
        "catalog_lang",
        F.when(F.col("lang_attr") == "", F.lit("missing"))
        .when(F.col("lang_attr") == F.col("catalog_lang"), F.lit("match"))
        .otherwise(F.lit("mismatch"))
        .alias("verdict"),
    )


def soft404_screen(
    df: DataFrame,
    id_col: str,
    title_col: str,
    text_col: str,
    min_chars: int | None = None,
) -> DataFrame:
    """Soft-404 / error-template screen (rules.py SOFT404_*): a page whose
    TITLE matches the error pattern is a soft 404 outright; an error
    PHRASE in the body only convicts when the body is also short, so an
    article ABOUT 404 pages survives. Integer rule flags + first-failing
    taxonomy mirror the pipeline's drop_rule style. Pure row-local regex
    — zero shuffles at any corpus size."""
    min_chars = rules.SOFT404_MIN_CHARS if min_chars is None else min_chars
    t = F.col(title_col)
    b = F.col(text_col)
    f_title = t.rlike(rules.SOFT404_TITLE_RE)
    f_phrase = b.rlike(rules.SOFT404_PHRASE_RE)
    f_short = F.length(b) < F.lit(min_chars)
    return df.select(
        F.col(id_col),
        f_title.cast("long").alias("flag_title"),
        f_phrase.cast("long").alias("flag_phrase"),
        f_short.cast("long").alias("flag_short"),
        F.when(f_title, F.lit("title_404"))
        .when(f_phrase & f_short, F.lit("body_404"))
        .otherwise(F.lit("ok"))
        .alias("verdict"),
    )


def parse_url(url: Column) -> tuple[Column, Column]:
    """(host, path) of a URL: host lowercased (authority case is not
    identity), path defaulting to '/' when absent (RFC 9309 matches the
    empty path as '/')."""
    host = F.lower(F.regexp_extract(url, URL_HOST_RE, 1))
    raw_path = F.regexp_extract(url, URL_PATH_RE, 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    return host, path


def robots_filter(
    urls: DataFrame, robot_rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """RFC 9309 / Google robots.txt matching over a URL frontier:
    `robot_rules` is (host, prefix, allow 0/1); among a URL's host rules
    whose prefix path-matches, the LONGEST prefix wins and Allow beats
    Disallow on a length tie; no matching rule means allowed.

    Both resolutions collapse into one integer: best_key =
    2*len(prefix) + allow, maximized per URL — lexicographic (len, allow)
    order without a window or a struct (portable to the SQL oracle
    verbatim). Shape at scale: the rules table is per-host and tiny next
    to a 100 TB frontier — BROADCAST left join (URLs never shuffle), then
    ONE map-side-combinable max() agg keyed on the URL."""
    host, path = parse_url(F.col(url_col))
    u = urls.select(F.col(url_col).alias("url"), host.alias("host"), path.alias("path"))
    r = robot_rules.select(
        F.col("host").alias("r_host"),
        F.col("prefix"),
        F.col("allow").cast("long").alias("allow"),
    )
    j = u.join(
        F.broadcast(r),
        (F.col("host") == F.col("r_host")) & F.col("path").startswith(F.col("prefix")),
        "left",
    )
    key = F.when(
        F.col("prefix").isNotNull(), F.length("prefix") * 2 + F.col("allow")
    ).cast("long")
    agg = j.groupBy("url", "host", "path").agg(F.max(key).alias("best_key"))
    return agg.select(
        "url",
        "host",
        "path",
        F.coalesce("best_key", F.lit(-1)).cast("long").alias("best_key"),
        F.when(
            F.col("best_key").isNull() | (F.col("best_key") % 2 == 1), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("allowed"),
    )


META_ROBOTS_RE = r'(?is)<meta[^>]*name="robots"[^>]*content="([^"]*)"'


def meta_robots_screen(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Page-level robots directives — the in-document half of the
    robots.txt policy (RFC 9309 §2.5 / robots meta): extract the
    `<meta name="robots" content="...">` value, flag `noindex` (the
    page must not enter the corpus — consent-respecting pipelines
    honor it like a disallow) and `nofollow` (its outlinks must not
    feed the frontier), with a first-failing verdict. Token-boundary
    matching ('noindex' inside 'no-noindexing' does not count): the
    content value is comma/space-separated tokens per the standard.
    Pure row-local regex — one codegen projection, zero shuffles."""
    content = F.lower(
        F.regexp_extract(F.col(html_col), META_ROBOTS_RE, 1)
    )
    padded = F.concat(F.lit(","), F.regexp_replace(content, r"[,\s]+", ","), F.lit(","))
    noindex = padded.contains(",noindex,").cast("long")
    nofollow = (
        padded.contains(",nofollow,") | padded.contains(",none,")
    ).cast("long")
    return df.select(
        F.col(id_col),
        content.alias("robots_content"),
        F.when(padded.contains(",none,"), F.lit(1)).otherwise(noindex)
        .cast("long")
        .alias("noindex"),
        nofollow.alias("nofollow"),
    ).select(
        id_col,
        "robots_content",
        "noindex",
        "nofollow",
        F.when(F.col("noindex") == 1, F.lit("drop"))
        .when(F.col("nofollow") == 1, F.lit("no_frontier"))
        .otherwise(F.lit("ok"))
        .alias("verdict"),
    )


UA_LINE_RE = r"(?i)^user-agent\s*:\s*(\S+)"
RULE_LINE_RE = r"(?i)^(disallow|allow)\s*:\s*(\S*)"


def robots_parse(
    df: DataFrame, host_col: str, body_col: str, agent: str = "*"
) -> DataFrame:
    """Raw robots.txt bodies -> the (host, prefix, allow) rules table
    ``robots_filter`` consumes, with RFC 9309 group semantics:

    - a run of consecutive ``User-agent:`` lines forms one group header;
      the Allow/Disallow lines after it belong to that group,
    - a group applies when any header token is ``*`` or equals `agent`
      (case-insensitive); rules of ALL applying groups merge (distinct),
    - rules before any User-agent line are ignored (RFC: outside a
      group), comments (``#`` to end of line) are stripped first,
    - an empty Disallow value is the no-restriction idiom (no rule), and
      rules carrying the ``*``/``$`` wildcard extension are excluded —
      ``robots_filter`` implements the plain prefix subset, the
      overwhelming production majority.

    Shape at scale: robots.txt bodies are one small row per HOST — per-
    host windows (lag + running sum assign group ids; keyed, never
    global), a tiny distinct applying-group frame joined back on
    (host, gid), one distinct on the reduced rules. All costs are on the
    hosts table, never the frontier."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("idx", "raw"),
    )
    # \s-trim (not F.trim) so CRLF bodies behave; identical in the oracle
    clean = F.regexp_replace(F.regexp_replace("raw", r"#.*$", ""), r"^\s+|\s+$", "")
    k = lines.select(
        "host",
        "idx",
        clean.alias("line"),
    ).select(
        "host",
        "idx",
        F.col("line").rlike(UA_LINE_RE).alias("is_ua"),
        F.lower(F.regexp_extract("line", UA_LINE_RE, 1)).alias("ua_token"),
        F.lower(F.regexp_extract("line", RULE_LINE_RE, 1)).alias("kind"),
        F.regexp_extract("line", RULE_LINE_RE, 2).alias("val"),
    )
    w = Window.partitionBy("host").orderBy("idx")
    with_prev = k.withColumn(
        "ua_start",
        (F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))).cast(
            "long"
        ),
    )
    g = with_prev.withColumn(
        "gid", F.sum("ua_start").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    applies = (
        g.where(
            F.col("is_ua")
            & F.col("ua_token").isin("*", agent.lower())
        )
        .select("host", "gid")
        .distinct()
    )
    rule_rows = g.where(
        (F.col("kind") != "")
        & (F.col("val") != "")
        & ~F.col("val").contains("*")
        & ~F.col("val").contains("$")
    )
    return (
        rule_rows.join(F.broadcast(applies), ["host", "gid"])
        .select(
            "host",
            F.col("val").alias("prefix"),
            (F.col("kind") == "allow").cast("long").alias("allow"),
        )
        .distinct()
    )


SITEMAP_URL_BLOCK_RE = r"(?is)<url>(.*?)</url>"
SITEMAP_SM_BLOCK_RE = r"(?is)<sitemap>(.*?)</sitemap>"
SITEMAP_LOC_RE = r"(?is)<loc>\s*(.*?)\s*</loc>"
SITEMAP_LASTMOD_RE = r"(?is)<lastmod>\s*(.*?)\s*</lastmod>"
SITEMAP_CHANGEFREQ_RE = r"(?is)<changefreq>\s*(.*?)\s*</changefreq>"
SITEMAP_PRIORITY_RE = r"(?is)<priority>\s*(.*?)\s*</priority>"


def sitemap_parse(df: DataFrame, id_col: str, xml_col: str) -> DataFrame:
    """Sitemap XML -> URL rows: the DISCOVERY half of the crawl-policy
    pair (robots_parse rules what may fetch; sitemaps declare what
    exists). Parses both document shapes of sitemaps.org: `<urlset>`
    entries emit kind='url' rows (loc entity-decoded — `&amp;` in query
    strings is the XML-required spelling — plus lastmod / changefreq /
    priority verbatim strings, '' when absent), and `<sitemapindex>`
    child pointers emit kind='sitemap' rows — the recursion frontier a
    crawler feeds back into fetch. Regex field extraction, not a DOM:
    the subset real sitemaps use, shared Java/RE2 syntax so the DuckDB
    oracle runs the same patterns verbatim. One posexplode per kind over
    row-local regex — zero shuffles beyond the union, any corpus size."""
    x = F.col(xml_col)

    def blocks(pat: str, kind: str) -> DataFrame:
        b = df.select(
            F.col(id_col),
            F.posexplode(F.regexp_extract_all(x, F.lit(pat), 1)).alias(
                "seq", "block"
            ),
        )
        blk = F.col("block")
        return b.select(
            id_col,
            F.lit(kind).alias("kind"),
            F.col("seq").cast("long").alias("seq"),
            _decode_entities(F.regexp_extract(blk, SITEMAP_LOC_RE, 1)).alias(
                "loc"
            ),
            F.regexp_extract(blk, SITEMAP_LASTMOD_RE, 1).alias("lastmod"),
            F.regexp_extract(blk, SITEMAP_CHANGEFREQ_RE, 1).alias("changefreq"),
            F.regexp_extract(blk, SITEMAP_PRIORITY_RE, 1).alias("priority"),
        )

    return blocks(SITEMAP_URL_BLOCK_RE, "url").unionByName(
        blocks(SITEMAP_SM_BLOCK_RE, "sitemap")
    )


ANCHOR_ELEM_RE = r'(?is)<a[^>]*href="[^"]*"[^>]*>.*?</a>'
ANCHOR_HREF_RE = r'(?i)href="([^"]*)"'
ANCHOR_TEXT_RE = r"(?is)>(.*?)</a>"


def anchor_text_harvest(
    df: DataFrame, id_col: str, html_col: str
) -> DataFrame:
    """Anchor-text harvest — the classic web-corpus retrieval signal
    (how OTHER pages describe a target): explode every href-carrying
    `<a>` element, split it into target href and entity-decoded inner
    text (inline markup stripped), tokenize, and count (href, token)
    pairs across the corpus. The harvested terms index the TARGET
    document for retrieval even when its own text never says them.

    Shape at 100 TB: one posexplode per page (anchors stay with their
    task), token explode row-local, then ONE combinable groupBy on
    (href, token) — the reduced term card shuffles, never pages. Pure
    shared-subset regex, so the DuckDB oracle runs the same patterns."""
    anchors = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_ELEM_RE), 0)
        ).alias("a"),
    )
    text = _decode_entities(
        F.regexp_replace(
            F.regexp_extract("a", ANCHOR_TEXT_RE, 1),
            r"(?s)</?[a-zA-Z!?][^>]*>",
            "",
        )
    )
    toks = anchors.select(
        "_doc",
        F.regexp_extract("a", ANCHOR_HREF_RE, 1).alias("href"),
        F.explode(
            F.split(F.lower(F.trim(text)), r"\s+")
        ).alias("token"),
    ).where((F.col("token") != "") & (F.col("href") != ""))
    return toks.groupBy("href", "token").agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("_doc").cast("long").alias("n_docs"),
    )


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the CDX index
    key CommonCrawl orders its URL lookup index by: canonicalize
    (htmlextract.url_canonicalize: lowercase authority, default ports
    and trackers stripped, params sorted), then reverse the host
    components (`cdn.example.org` -> `org,example,cdn`), drop a leading
    `www.`, keep a non-default port after the host run, append `)` and
    the lowercased path+query. Prefix-ordering by site: every URL of a
    registrable domain sorts adjacent, which is what makes range-pruned
    index lookups work. Pure Column algebra."""
    from .htmlextract import url_canonicalize

    canon = url_canonicalize(url)
    prefix = F.regexp_extract(canon, r"^([a-z][a-z0-9+.-]*://[^/?#]+)", 1)
    auth = F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    pathq = canon.substr(F.length(prefix) + 1, F.lit(2_000_000_000))
    host = F.regexp_extract(auth, r"^([^:]+)", 1)
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    host_nw = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host_nw, r"\.")), ",")
    return F.concat(
        rev,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.lit(")"),
        F.lower(pathq),
    )


def cdx_index(
    df: DataFrame, url_col: str, ts_col: str, payload_col: str
) -> DataFrame:
    """CDX-style capture index over crawl records: (surt, ts, url,
    digest, idx) globally ordered by (surt, ts, url) — the lookup index
    a WARC archive ships next to its shards. digest is the payload md5
    (the dedup/revisit key). Ordering uses pairs.global_rank (range
    sort + per-partition offsets — never a single-partition window);
    the ranked frame is the slim 4-column projection, payloads never
    enter the sort. At scale the written index is range-partitioned by
    surt, so a URL lookup prunes to one partition — the zone-map
    pattern over string keys."""
    from .pairs import global_rank

    slim = df.select(
        surt_key(F.col(url_col)).alias("surt"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(url_col).alias("url"),
        F.md5(F.col(payload_col).cast("binary")).alias("digest"),
    )
    return global_rank(slim, ["surt", "ts", "url"], rank_col="idx")


def outlink_profile(
    df: DataFrame,
    id_col: str,
    html_col: str,
    own_prefix_col: str,
    min_links: int | None = None,
    ext_permille: int | None = None,
) -> DataFrame:
    """Per-page outlink profile + link-farm screen: internal vs external
    href counts (internal = href starts with the page's own authority
    prefix, `own_prefix_col`), external share in integer permille, and
    the link-farm verdict (rules.LINKFARM_*: mostly-external pages with
    enough links for the ratio to mean anything are SEO chrome, not
    content). Counting is occurrence ARITHMETIC — (len(html) -
    len(replace(html, needle))) / len(needle) — not regex-with-
    computed-pattern, so the per-row own-domain needle stays portable
    to the SQL oracle verbatim. One codegen projection, zero Python,
    zero shuffles at any corpus size."""
    min_links = rules.LINKFARM_MIN_LINKS if min_links is None else min_links
    ext_permille = (
        rules.LINKFARM_EXT_PERMILLE if ext_permille is None else ext_permille
    )
    h = F.col(html_col)
    all_needle = F.lit('href="')
    own_needle = F.concat(F.lit('href="'), F.col(own_prefix_col))

    def occurrences(needle: Column) -> Column:
        return (
            (F.length(h) - F.length(F.replace(h, needle, F.lit(""))))
            / F.length(needle)
        ).cast("long")

    n_links = occurrences(all_needle)
    n_internal = occurrences(own_needle)
    f = df.select(
        F.col(id_col),
        n_links.alias("n_links"),
        n_internal.alias("n_internal"),
        (n_links - n_internal).alias("n_external"),
    )
    ext_pm = F.when(
        F.col("n_links") > 0,
        F.expr("(n_external * 1000) div n_links"),
    ).cast("long")
    return f.select(
        "*",
        ext_pm.alias("external_permille"),
        F.when(
            (F.col("n_links") >= min_links)
            & (F.col("n_external") * 1000 >= F.lit(ext_permille) * F.col("n_links")),
            F.lit("link_farm"),
        )
        .otherwise(F.lit("ok"))
        .alias("verdict"),
    )


def template_lines(
    pages: DataFrame,
    id_col: str,
    domain_col: str,
    text_col: str,
    df_permille: int | None = None,
    min_docs: int | None = None,
) -> DataFrame:
    """CCNet-style per-domain template-line removal: a LINE appearing on
    >= `df_permille` of its domain's pages (and >= `min_docs` pages) is
    chrome — nav, footer, cookie banner — and is removed from EVERY
    page, including the first seen (unlike paragraph_dedup's keep-first:
    boilerplate has no canonical copy worth keeping). Judged per domain,
    so one site's footer never convicts another site's content. Emits
    (id, domain, n_lines, n_dropped, text) with the kept lines rejoined
    in original order.

    Shape at 100 TB: line explode is row-local; the line-frequency count
    is ONE combinable groupBy on (domain, line); the drop decision joins
    back on the same (domain, line) key — co-partitioned with the count,
    no extra exchange under AQE; re-assembly is one doc-keyed groupBy.
    Every shuffle keyed, nothing global."""
    df_permille = rules.TEMPLATE_DF_PERMILLE if df_permille is None else df_permille
    min_docs = rules.TEMPLATE_MIN_DOCS if min_docs is None else min_docs
    lines = pages.select(
        F.col(id_col).alias("_doc"),
        F.col(domain_col).alias("_dom"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    n_pages = pages.groupBy(F.col(domain_col).alias("_dom")).agg(
        F.count("*").cast("long").alias("n_pages")
    )
    line_df = (
        lines.select("_dom", "line", "_doc")
        .distinct()
        .groupBy("_dom", "line")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .join(n_pages, "_dom")
    )
    droplist = line_df.where(
        (F.col("n_docs") >= min_docs)
        & (F.col("n_docs") * 1000 >= F.lit(df_permille) * F.col("n_pages"))
    ).select("_dom", "line", F.lit(1).alias("_drop"))
    flagged = lines.join(droplist, ["_dom", "line"], "left")
    # collect_list skips the NULL structs of dropped lines; array_sort on
    # (idx, line) structs restores original order
    flagged = flagged.withColumn(
        "s",
        F.when(F.col("_drop").isNull(), F.struct(F.col("idx"), F.col("line"))),
    )
    agg = flagged.groupBy("_doc", "_dom").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.coalesce(F.col("_drop").cast("long"), F.lit(0)))
        .cast("long")
        .alias("n_dropped"),
        F.array_join(
            F.expr("transform(array_sort(collect_list(s)), e -> e.line)"),
            "\n",
        ).alias("text"),
    )
    return agg.select(
        F.col("_doc").alias(id_col),
        F.col("_dom").alias(domain_col),
        "n_lines",
        "n_dropped",
        F.coalesce("text", F.lit("")).alias("text"),
    )


def url_quality_screen(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """RefinedWeb-style URL-shape screen — the cheapest gate in the whole
    pipeline, applied BEFORE paying to fetch: path depth (segment
    count), query-parameter count, digit share of the path (integer
    permille), and path length, with a first-failing verdict
    (rules.URLQ_*: deep calendar trees, parameter farms, digit-heavy
    session/spam paths). Pure row-local regex/arithmetic — one codegen
    projection, zero Python, zero shuffles at any frontier size."""
    host, path = parse_url(F.col(url_col))
    qs = F.regexp_extract(F.col(url_col), r"\?([^#]*)", 1)
    u = urls.select(
        F.col(url_col).alias("url"),
        host.alias("host"),
        path.alias("path"),
        qs.alias("qs"),
    )
    depth = (
        F.size(F.regexp_extract_all(F.col("path"), F.lit("/"), 0)).cast("long")
    )
    n_params = F.when(F.col("qs") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("qs"), "&")).cast("long")
    ).cast("long")
    plen = F.length("path").cast("long")
    digit_pm = F.expr(
        "CASE WHEN length(path) > 0 THEN"
        " (size(regexp_extract_all(path, '[0-9]', 0)) * 1000) div length(path)"
        " END"
    ).cast("long")
    f = u.select(
        "url",
        "host",
        depth.alias("depth"),
        n_params.alias("n_params"),
        plen.alias("path_len"),
        digit_pm.alias("digit_permille"),
    )
    return f.select(
        "*",
        F.when(F.col("depth") > rules.URLQ_MAX_DEPTH, F.lit("deep_path"))
        .when(F.col("n_params") > rules.URLQ_MAX_PARAMS, F.lit("param_farm"))
        .when(
            F.col("digit_permille") > rules.URLQ_MAX_DIGIT_PERMILLE,
            F.lit("digit_heavy"),
        )
        .when(F.col("path_len") > rules.URLQ_MAX_PATH_LEN, F.lit("long_path"))
        .otherwise(F.lit("ok"))
        .alias("verdict"),
    )


def frontier_schedule(
    urls: DataFrame, url_col: str = "url", per_wave: int | None = None
) -> DataFrame:
    """Politeness scheduler over a URL frontier: fetches to the same host
    must not run concurrently without bound, so each URL gets a per-host
    slot (deterministic order: the URL string) and a fetch wave of at
    most `per_wave` URLs per host (rules.FRONTIER_PER_WAVE). A crawler
    executes wave 0 everywhere, then wave 1, … — cross-host parallelism
    stays maximal while per-host concurrency is capped. One keyed window
    (partitioned BY HOST — never global); the frontier shuffles once on
    host, the same partitioning a per-host fetch executor wants."""
    per_wave = rules.FRONTIER_PER_WAVE if per_wave is None else per_wave
    host, path = parse_url(F.col(url_col))
    u = urls.select(F.col(url_col).alias("url"), host.alias("host"))
    w = Window.partitionBy("host").orderBy("url")
    slot = F.row_number().over(w).cast("long")
    return u.select("url", "host", slot.alias("slot")).select(
        "url",
        "host",
        "slot",
        # integer div (Spark div == DuckDB //), never float-then-truncate
        F.expr(f"(slot - 1) div {int(per_wave)}").cast("long").alias("wave"),
    )


def cdx_revisits(captures: DataFrame) -> DataFrame:
    """Revisit detection over CDX captures (surt, ts, url, digest): a
    capture whose payload digest already appeared at an earlier (ts,
    url) is a 'revisit' — WARC's revisit-record semantics, the signal
    that lets an archive store the body ONCE and the fetch event many
    times. Digest-keyed window (never global): per digest, captures
    rank by (ts, url); rank 1 is the original. Dedup-adjacent but
    event-preserving: unlike dedup_exact, every capture row survives,
    labeled."""
    w = Window.partitionBy("digest").orderBy("ts", "url")
    rk = F.row_number().over(w).cast("long")
    return captures.select(
        "surt",
        "ts",
        "url",
        "digest",
        rk.alias("capture_seq"),
        F.when(rk == 1, F.lit("original")).otherwise(F.lit("revisit")).alias(
            "verdict"
        ),
    )


def domain_quality_card(
    pages: DataFrame,
    domain_col: str,
    kept_col: str = "kept_permille",
    script_col: str = "had_script",
    low_kept_permille: int | None = None,
    review_permille: int | None = None,
) -> DataFrame:
    """Domain-level yield card over html_extract output: pages, the
    domain's aggregate kept ratio (integer permille of char SUMS, so one
    huge page weighs its size), the share of low-yield pages and of
    scripted pages, and the blocklist-review verdict (rules.py DOMAIN_*).
    RefinedWeb-class pipelines gate whole domains before paying for
    per-document screens. Combinable sums only; the shuffle carries the
    reduced card, never pages."""
    low = rules.DOMAIN_LOW_KEPT_PERMILLE if low_kept_permille is None else low_kept_permille
    review = rules.DOMAIN_REVIEW_PERMILLE if review_permille is None else review_permille
    g = pages.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").cast("long").alias("n_pages"),
        F.sum("n_chars_html").cast("long").alias("sum_html"),
        F.sum("n_chars_text").cast("long").alias("sum_text"),
        F.sum((F.col(kept_col) < low).cast("long")).cast("long").alias("n_low"),
        F.sum(script_col).cast("long").alias("n_script"),
    )
    low_pm = F.expr("(n_low * 1000) div n_pages").cast("long")
    return g.select(
        "domain",
        "n_pages",
        F.expr("(sum_text * 1000) div sum_html").cast("long").alias("kept_permille"),
        low_pm.alias("low_permille"),
        F.expr("(n_script * 1000) div n_pages").cast("long").alias("script_permille"),
        F.when(low_pm >= review, F.lit("review")).otherwise(F.lit("ok")).alias("verdict"),
    )
