"""HTML -> text extraction: the stage-zero operator of every web-corpus
pipeline (C4 / CCNet / RefinedWeb start from crawled HTML, not plain
text), and the gap in this engine's text family until r5 — every other
screen assumes `text` already exists. Reference analog: kneaddata's trim
stages cut non-content SPANS out of a read before the filters run
(run.py:372-450); here the non-content spans are markup.

Spark-first shape: the whole extraction is a chain of JVM
`regexp_replace` / `replace` expressions — one whole-stage-codegen
project, zero Python, zero shuffles, embarrassingly parallel at any
corpus size. At 100 TB this is the ideal operator class: no state, no
skew surface, scan-bandwidth-bound.

Regex portability (the oracle runs the same pipeline in DuckDB/RE2,
Spark compiles Java regex): every pattern below sticks to the shared
subset — inline `(?is)` flags, non-greedy `.*?`, `[^>]` classes, ASCII
`\\s` (the one divergence, Java's `\\x0B` in `\\s`, cannot occur here:
the markup this operator removes is synthesized/crawled text where
vertical-tab never survives parquet ingestion of the documents table).
Entity decode uses plain (non-regex) `replace`, identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) applied IN ORDER. Markup is removed before
# entities are decoded — an entity-encoded tag (&lt;b&gt;) is CONTENT,
# not markup, and must survive extraction as literal '<b>'.
_BLOCK_RE = [
    # script/style elements: drop the whole element INCLUDING its body
    # (embedded '<', '&&', quotes in code must not leak into text)
    (r"(?is)<script[^>]*>.*?</script>", ""),
    (r"(?is)<style[^>]*>.*?</style>", ""),
    # comments
    (r"(?s)<!--.*?-->", ""),
    # block-level boundaries become newlines BEFORE the generic strip so
    # paragraph structure survives as line structure
    (r"(?i)<(?:br[^>]*|/p|/div|/li|/h[1-6]|/tr|/title|/ul|/ol|/table)>", "\n"),
    # every remaining tag vanishes
    (r"(?s)</?[a-zA-Z!?][^>]*>", ""),
]

# minimal entity table (ordered; &amp; LAST so '&amp;lt;' decodes to
# '&lt;' exactly once, the html5 single-pass rule)
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

_WS_RE = [
    (r"[ \t]+", " "),          # collapse horizontal runs
    (r" *\n[\n ]*", "\n"),     # any newline run (with stray spaces) -> one
    (r"^\s+|\s+$", ""),        # trim
]

# href harvest runs on the RAW html (attributes are markup, so entity
# decode does not apply); inline (?i) keeps the pattern portable without
# engine-specific option arguments
HREF_RE = r'(?i)href="([^"]*)"'
DOMAIN_RE = r'^[a-z][a-z0-9+.-]*://([^/"]+)'


def extract_text_col(html: Column) -> Column:
    """The extraction pipeline as a single Column expression."""
    out = html
    for pat, rep in _BLOCK_RE:
        out = F.regexp_replace(out, pat, rep)
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    for pat, rep in _WS_RE:
        out = F.regexp_replace(out, pat, rep)
    return out


def html_extract(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Extracted text + per-document accounting: raw/extracted sizes, the
    kept ratio (exact integer permille), script/style presence flags and
    the raw link count. The accounting is what a curator reads — a page
    whose kept_permille is tiny is boilerplate/chrome, and a corpus-level
    histogram of kept_permille is the first crawl-quality card."""
    h = F.col(html_col)
    text = extract_text_col(h)
    out = df.select(
        F.col(id_col),
        text.alias("text"),
        F.length(h).cast("long").alias("n_chars_html"),
        F.length(text).cast("long").alias("n_chars_text"),
        F.when(h.contains("<script"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("had_script"),
        F.when(h.contains("<style"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("had_style"),
        F.size(F.regexp_extract_all(h, F.lit(HREF_RE), 1)).cast("long").alias("n_links"),
    )
    return out.withColumn(
        "kept_permille",
        F.when(
            F.col("n_chars_html") > 0,
            F.expr("(n_chars_text * 1000) div n_chars_html"),
        ).cast("long"),
    )


# block boundaries for jusText-style segmentation: every opening OR
# closing block-level tag starts a new segment (inline tags — a, b, i,
# span, em — stay inside their segment so anchor text can be measured)
BOUNDARY_RE = (
    r"(?i)</?(?:p|div|li|h[1-6]|tr|table|ul|ol|br|section|article|td|th)[^>]*>"
)
ANCHOR_RE = r"(?is)<a[^>]*>.*?</a>"
_PRE_CLEAN_RE = _BLOCK_RE[:3]  # script/style/comment removal
_INLINE_STRIP_RE = _BLOCK_RE[4][0]  # generic letter-open tag strip


def segment_text(seg: Column) -> Column:
    """Per-segment text: inline tags strip, entities decode, whitespace
    normalizes (no block-newline stage — boundaries already split)."""
    out = F.regexp_replace(seg, _INLINE_STRIP_RE, "")
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    for pat, rep in _WS_RE:
        out = F.regexp_replace(out, pat, rep)
    return out


def main_content(
    df: DataFrame,
    id_col: str,
    html_col: str,
    min_chars: int | None = None,
    nav_permille: int | None = None,
) -> DataFrame:
    """jusText-style main-content segmentation: split the page at block
    tag boundaries, extract each segment's text, measure its anchor-text
    share (chars of extracted text minus chars after `<a>…</a>` spans are
    removed — no list lambdas, so the measurement ports to the oracle),
    and rule: short chrome / nav (link-dense menus, footers) / content.
    The boilerplate remover C4-class pipelines run between raw extraction
    and the document screens.

    Shape at scale: one posexplode (segments stay with their task — no
    shuffle) over the same zero-shuffle regex algebra as html_extract;
    emitted rows carry only segment text, never the page."""
    from .. import rules

    min_chars = rules.MAIN_MIN_SEG_CHARS if min_chars is None else min_chars
    nav_permille = (
        rules.MAIN_NAV_LINK_PERMILLE if nav_permille is None else nav_permille
    )
    pre = F.col(html_col)
    for pat, rep in _PRE_CLEAN_RE:
        pre = F.regexp_replace(pre, pat, rep)
    segs = df.select(
        F.col(id_col),
        F.posexplode(F.split(pre, BOUNDARY_RE)).alias("seg_idx", "seg"),
    )
    text = segment_text(F.col("seg"))
    no_anchor = segment_text(F.regexp_replace(F.col("seg"), ANCHOR_RE, ""))
    out = segs.select(
        id_col,
        F.col("seg_idx").cast("long").alias("seg_idx"),
        text.alias("text"),
        F.length(text).cast("long").alias("n_chars"),
        (F.length(text) - F.length(no_anchor)).cast("long").alias("anchor_chars"),
    ).where(F.col("n_chars") > 0)
    return out.select(
        id_col,
        "seg_idx",
        "text",
        "n_chars",
        F.expr("(anchor_chars * 1000) div n_chars").cast("long").alias(
            "anchor_permille"
        ),
        F.when(
            F.col("anchor_chars") * 1000 >= F.lit(nav_permille) * F.col("n_chars"),
            F.lit("nav"),
        )
        .when(F.col("n_chars") < min_chars, F.lit("short"))
        .otherwise(F.lit("content"))
        .alias("verdict"),
    )


def url_canonicalize(url: Column) -> Column:
    """Canonical URL form — the key for crawl-frontier dedup (the same
    page arrives as HTTPS://Ex.ORG:443/p/?utm_source=feed#frag and
    https://ex.org/p): drop the fragment, lowercase scheme+authority,
    strip default ports (:80 http / :443 https), remove tracking params
    (utm_*, fbclid, gclid), SORT the surviving query params (param order
    is not page identity), strip trailing path slashes. Pure Column
    algebra — every step is portable to the DuckDB oracle with no
    replacement group refs (Spark spells them $1, RE2 \\1 — avoided
    entirely: extraction + CASE + sentinel-'&' tricks instead)."""
    nofrag = F.regexp_replace(url, r"#.*$", "")
    prefix = F.regexp_extract(nofrag, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", 1)
    # rest = everything after the authority (path + query)
    rest = nofrag.substr(F.length(prefix) + 1, F.lit(2_000_000_000))
    lp = F.lower(prefix)
    lp = (
        F.when(
            lp.startswith("http://") & lp.endswith(":80"),
            lp.substr(F.lit(1), F.length(lp) - 3),
        )
        .when(
            lp.startswith("https://") & lp.endswith(":443"),
            lp.substr(F.lit(1), F.length(lp) - 4),
        )
        .otherwise(lp)
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    qs = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    # sentinel '&' so every param (incl. the first) starts with '&', strip
    # tracking params, drop the sentinel, then sort what survives
    q = F.regexp_replace(
        F.concat(F.lit("&"), qs),
        r"&(?:utm_[a-zA-Z0-9_]*|fbclid|gclid)=[^&]*",
        "",
    )
    q = F.regexp_replace(q, r"^&+", "")
    q = F.array_join(F.array_sort(F.split(q, "&")), "&")
    cpath = F.regexp_replace(path, r"/+$", "")
    return F.concat(
        lp, cpath, F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    )


def link_domains(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Outlink-domain frequency card: harvest every href, reduce to its
    authority (scheme://HOST/...), count links and distinct source docs
    per domain. The URL-frequency basis for domain blocklists and crawl
    prioritization. One explode + one combinable groupBy (count and
    distinct-doc count both map-side combinable after the per-doc
    explode); domains are low-cardinality relative to links, so the
    shuffle carries only the reduced card."""
    links = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), 1)).alias("url"),
    )
    doms = links.select(
        "_doc", F.regexp_extract("url", DOMAIN_RE, 1).alias("domain")
    ).where(F.col("domain") != "")
    return doms.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_links"),
        F.countDistinct("_doc").cast("long").alias("n_docs"),
    )
