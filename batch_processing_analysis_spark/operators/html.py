"""HTML text + link extraction (M169/M170 — the crawl→corpus text
step and the frontier-expansion step): turn fetched HTML payloads
into (a) clean training text and (b) absolute out-links.

Engine rules: pure codegen — every stage is a ``regexp_replace`` /
``regexp_extract_all`` chain in the Java-regex ∩ RE2 common subset
(no backreferences, no lookaround), so the SAME pattern strings
re-run verbatim in the DuckDB oracle twins (q178/q179). This is the
regex-tier extractor (the boilerplate-removal tier — readability/
trafilatura-class DOM scoring — is out of scope and documented as
such; for LLM-corpus work the regex tier is what C4 used).

``html_to_text`` (M169):
- ``<script>``/``<style>``/``<noscript>`` blocks drop WITH their
  content (three separate lazy DOTALL patterns — no backreference);
- comments drop; ``<br>`` and block-level CLOSERS become newlines so
  paragraph structure survives the tag strip;
- remaining tags strip to a space; the five XML entities plus
  ``&nbsp;``/``&#39;`` unescape (numeric character references beyond
  these are out of scope — they survive as literals, never crash);
- whitespace canonicalizes: horizontal runs → one space, spaces
  around newlines drop, blank-line runs collapse to ONE newline,
  ends trimmed.

``extract_links`` (M170):
- anchors found as ``<a …>`` open tags; ``href`` read from double-
  quoted, single-quoted, or bare-token forms (first match wins);
- entity-unescaped (``&amp;`` in query strings is the normal case);
- with a base-URL column, each href resolves to an absolute URL via
  functions/web.py:url_resolve (RFC 3986 §5.2.2, fuzz-pinned against
  stdlib urljoin) — the crawl-frontier expansion primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared verbatim with the q178/q179 DuckDB oracles
DROP_BLOCK_RES = [
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?is)<noscript\b[^>]*>.*?</noscript\s*>",
    r"(?s)<!--.*?-->",
]
NEWLINE_TAG_RE = (r"(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/table|/ul|/ol|"
                  r"/blockquote|/section|/article|/title)\b[^>]*>")
ANY_TAG_RE = r"(?s)</?[A-Za-z!][^>]*>"
ANCHOR_RE = r"(?is)<a\s[^>]*>"
HREF_DQ_RE = r'(?is)\bhref\s*=\s*"([^"]*)"'
HREF_SQ_RE = r"(?is)\bhref\s*=\s*'([^']*)'"
HREF_BARE_RE = r"""(?is)\bhref\s*=\s*([^\s"'>]+)"""

# order matters: &amp; LAST so '&amp;lt;' unescapes to literal '&lt;'
HTML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&apos;", "'"), ("&#39;", "'"), ("&nbsp;", " "),
                 ("&amp;", "&")]


def _unescape(col: Column) -> Column:
    for ent, ch in HTML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def html_to_text(html: Column) -> Column:
    """Fetched HTML → clean text (see module docstring for the exact
    pipeline). NULL in → NULL out."""
    t = html
    for pat in DROP_BLOCK_RES:
        t = F.regexp_replace(t, pat, " ")
    t = F.regexp_replace(t, NEWLINE_TAG_RE, "\n")
    t = F.regexp_replace(t, ANY_TAG_RE, " ")
    t = _unescape(t)
    t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n+", "\n")
    # trim() strips spaces only — mixed space/newline ends need this
    return F.regexp_replace(t, r"^[ \n]+|[ \n]+$", "")


def extract_links(df: DataFrame, html_col: str = "html",
                  base_col: str | None = None) -> DataFrame:
    """One row per anchor href in ``df[html_col]`` (all other columns
    carried through, minus the HTML itself): ``href`` is the raw
    entity-unescaped attribute value; with ``base_col``, ``resolved``
    is the absolute URL (NULL for un-resolvable forms — a javascript:
    or mailto: href returns verbatim per the own-scheme rule, so
    filter on ``resolved`` scheme downstream). Empty hrefs and
    anchors without an href are dropped."""
    from ..functions import web as WEB

    keep = [c for c in df.columns if c != html_col]
    tags = df.select(
        *keep,
        F.explode(F.regexp_extract_all(
            html_col, F.lit(ANCHOR_RE), 0)).alias("_a_tag"),
    )
    href = F.when(F.regexp_extract("_a_tag", HREF_DQ_RE, 1) != "",
                  F.regexp_extract("_a_tag", HREF_DQ_RE, 1)) \
        .when(F.regexp_extract("_a_tag", HREF_SQ_RE, 1) != "",
              F.regexp_extract("_a_tag", HREF_SQ_RE, 1)) \
        .otherwise(F.regexp_extract("_a_tag", HREF_BARE_RE, 1))
    out = (
        tags.withColumn("href", _unescape(F.trim(href)))
        .filter(F.col("href") != "")
        .drop("_a_tag")
    )
    if base_col is not None:
        out = out.withColumn(
            "resolved",
            WEB.url_resolve(F.col(base_col), F.col("href")))
    return out


# meta/link attribute patterns (q182 oracle shares them verbatim):
# name/content and rel/href in EITHER attribute order, double- or
# single-quoted values
META_NAMED_DQ = (r'(?is)<meta\s[^>]*name\s*=\s*["\']{NAME}["\']'
                 r'[^>]*content\s*=\s*"([^"]*)"')
META_NAMED_SQ = (r"(?is)<meta\s[^>]*name\s*=\s*[\"']{NAME}[\"']"
                 r"[^>]*content\s*=\s*'([^']*)'")
META_REV_DQ = (r'(?is)<meta\s[^>]*content\s*=\s*"([^"]*)"'
               r'[^>]*name\s*=\s*["\']{NAME}["\']')
META_REV_SQ = (r"(?is)<meta\s[^>]*content\s*=\s*'([^']*)'"
               r"[^>]*name\s*=\s*[\"']{NAME}[\"']")
TITLE_RE = r"(?is)<title[^>]*>(.*?)</title\s*>"
CANONICAL_DQ = (r'(?is)<link\s[^>]*rel\s*=\s*["\']canonical["\']'
                r'[^>]*href\s*=\s*"([^"]*)"')
CANONICAL_SQ = (r"(?is)<link\s[^>]*rel\s*=\s*[\"']canonical[\"']"
                r"[^>]*href\s*=\s*'([^']*)'")
CANONICAL_REV_DQ = (r'(?is)<link\s[^>]*href\s*=\s*"([^"]*)"'
                    r'[^>]*rel\s*=\s*["\']canonical["\']')
CHARSET_RE = r"""(?is)<meta\s[^>]*charset\s*=\s*["']?([A-Za-z0-9_-]+)"""


def _meta_content(html: Column, name: str) -> Column:
    """First non-empty match across the four attribute-order/quote
    variants for ``<meta name="{name}" content="…">``."""
    pats = [p.replace("{NAME}", name)
            for p in (META_NAMED_DQ, META_NAMED_SQ,
                      META_REV_DQ, META_REV_SQ)]
    col = F.regexp_extract(html, pats[0], 1)
    for p in pats[1:]:
        col = F.when(col != "", col) \
            .otherwise(F.regexp_extract(html, p, 1))
    return col


def html_meta(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Add page-metadata columns to a frame of HTML payloads (M173 —
    the in-page half of crawl compliance beside robots.txt M164:
    ``noindex`` pages must be EXCLUDED from a compliant corpus, and
    ``canonical`` is the page's own dedup hint):

    - ``title`` — first ``<title>`` text, whitespace-collapsed,
      entity-unescaped;
    - ``meta_description`` — ``<meta name="description">`` content
      (either attribute order, either quote style);
    - ``canonical_url`` — ``<link rel="canonical">`` href,
      entity-unescaped (feed to url_resolve/url_canonicalize);
    - ``meta_robots`` — lowercased ``<meta name="robots">`` content;
      ``noindex`` / ``nofollow`` booleans are token-tests on it
      (comma/space separated per the de-facto spec);
    - ``charset`` — ``<meta charset=…>`` or the charset parameter of
      a content-type meta, lowercased.

    Pure codegen; the same patterns re-run in the q182 oracle."""
    h = F.col(html_col)
    title = F.regexp_extract(h, TITLE_RE, 1)
    title = _unescape(F.trim(F.regexp_replace(title, r"\s+", " ")))
    canonical = F.regexp_extract(h, CANONICAL_DQ, 1)
    canonical = F.when(canonical != "", canonical) \
        .otherwise(F.regexp_extract(h, CANONICAL_SQ, 1))
    canonical = F.when(canonical != "", canonical) \
        .otherwise(F.regexp_extract(h, CANONICAL_REV_DQ, 1))
    robots = F.lower(F.trim(_meta_content(h, "robots")))
    token = lambda t: robots.rlike(  # noqa: E731
        rf"(^|[,\s]){t}($|[,\s])")
    charset = F.lower(F.regexp_extract(h, CHARSET_RE, 1))
    return df.select(
        *df.columns,
        title.alias("title"),
        _unescape(F.trim(_meta_content(h, "description")))
        .alias("meta_description"),
        _unescape(F.trim(canonical)).alias("canonical_url"),
        robots.alias("meta_robots"),
        token("noindex").alias("noindex"),
        token("nofollow").alias("nofollow"),
        charset.alias("charset"),
    )
