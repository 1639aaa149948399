"""Sitemap parsing (M165 — the sitemaps.org XML protocol): turn a
corpus of fetched ``sitemap.xml`` payloads into URL rows — the crawl-
seed discovery stage that feeds the governance pipeline (robots
permission M164 → canonical dedup / PSL quotas M161-M163).

Scope (the sitemaps.org 0.9 schema, pinned in tests/test_sitemaps.py):

- ``<urlset>`` documents yield one row per ``<url>`` entry with
  ``loc`` (required), optional ``lastmod`` / ``changefreq`` /
  ``priority`` (default 0.5 per the spec when absent);
- ``<sitemapindex>`` documents yield one row per ``<sitemap>`` entry
  (kind = 'sitemap', the nested sitemap's ``loc`` + ``lastmod``) —
  the caller recurses by fetching those and calling this again;
- the five predefined XML entities in ``loc`` are unescaped
  (``&amp;`` LAST, so ``&amp;lt;`` round-trips correctly);
- malformed ``priority`` values go NULL (``try_cast``), entries with
  no ``<loc>`` are dropped (the spec makes loc mandatory);
- entry tags may carry ATTRIBUTES (``<url data-x="1">``,
  ``<urlset xmlns="...">`` — real sitemaps almost always namespace
  the root): the block pattern is ``<url(?:\\s[^>]*)?>``, tag name
  bounded so ``<urlset>`` never matches as a ``url`` block;
- ``<sitemapindex>`` recursion: :func:`expand_sitemap_indexes` runs
  the bounded-depth iterative expansion (k rounds of parse over
  fetched payloads supplied as a DataFrame).

Engine shape: pure codegen — ``regexp_extract_all`` with a DOTALL
block pattern explodes the entries, per-entry fields are
``regexp_extract`` projections, entity unescape is a fixed
``replace`` chain. No XML library, no UDF, no Python in the plan; the
same patterns re-run verbatim in the q174 DuckDB oracle. (Full XML —
CDATA, comments inside entries — is out of scope and documented as
such; real sitemap payloads are machine-generated to the plain
schema this parses.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# order matters: &amp; LAST so '&amp;lt;' unescapes to '&lt;' literal
XML_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                ("&apos;", "'"), ("&amp;", "&")]


def _unescape(col: F.Column) -> F.Column:
    for ent, ch in XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _entries(df: DataFrame, block_tag: str, kind: str) -> DataFrame:
    # attribute-tolerant open tag: `<url data-x="1">` parses, while
    # the tag-name boundary (attrs must start with whitespace) keeps
    # `<urlset …>` from matching as a `url` block
    block_re = f"(?s)<{block_tag}(?:\\s[^>]*)?>(.*?)</{block_tag}>"
    e = df.select(
        "domain",
        F.explode(F.regexp_extract_all(
            "sitemap_xml", F.lit(block_re), 1)).alias("entry"),
    )
    loc = F.trim(F.regexp_extract("entry", r"(?s)<loc>(.*?)</loc>", 1))
    return (
        e.select(
            "domain",
            F.lit(kind).alias("kind"),
            _unescape(loc).alias("loc"),
            F.trim(F.regexp_extract(
                "entry", r"(?s)<lastmod>(.*?)</lastmod>", 1))
            .alias("lastmod"),
            F.trim(F.regexp_extract(
                "entry", r"(?s)<changefreq>(.*?)</changefreq>", 1))
            .alias("changefreq"),
            F.when(
                F.regexp_extract(
                    "entry", r"(?s)<priority>(.*?)</priority>", 1) != "",
                F.trim(F.regexp_extract(
                    "entry", r"(?s)<priority>(.*?)</priority>", 1))
                .try_cast("double"),
            ).otherwise(
                F.when(F.lit(kind) == "url", F.lit(0.5))
            ).alias("priority"),
        )
        .filter(F.col("loc") != "")
    )


def parse_sitemaps(sitemaps: DataFrame, domain_col: str = "domain",
                   xml_col: str = "sitemap_xml") -> DataFrame:
    """Sitemap corpus → (domain, kind ∈ {url, sitemap}, loc, lastmod,
    changefreq, priority). ``kind='url'`` rows are crawlable URLs
    (priority defaults to 0.5 when the tag is absent, per the spec);
    ``kind='sitemap'`` rows are nested sitemaps from a
    ``<sitemapindex>`` (priority stays NULL — the spec defines none
    for index entries)."""
    base = sitemaps.select(F.col(domain_col).alias("domain"),
                           F.col(xml_col).alias("sitemap_xml"))
    return _entries(base, "url", "url").unionByName(
        _entries(base, "sitemap", "sitemap"))


def parse_w3c_datetime(col: F.Column) -> F.Column:
    """Parse a sitemaps.org ``lastmod`` value (W3C datetime) to a
    timestamp: date-only ``YYYY-MM-DD`` or full datetime with ``T``
    separator and optional trailing ``Z`` (both normalized to the
    space-separated form before ``try_cast``, evaluated in the
    session timezone — UTC in this engine). Numeric zone offsets are
    out of scope (documented): they ``try_cast`` to NULL, which the
    staleness logic treats as "no usable lastmod", never a wrong
    ordering."""
    norm = F.regexp_replace(F.trim(col), "Z$", "")
    norm = F.regexp_replace(norm, "T", " ")
    return norm.try_cast("timestamp")


def recrawl_status(corpus: DataFrame, entries: DataFrame,
                   url_col: str = "canon_url",
                   fetched_col: str = "fetched_at",
                   loc_col: str = "loc",
                   lastmod_col: str = "lastmod") -> DataFrame:
    """Recrawl planner (M168): compare the crawled ``corpus``
    (canonical URL → last fetch time) against the current sitemap
    ``entries`` (loc → lastmod) and classify every URL:

    - ``new``      — listed in the sitemap, never fetched;
    - ``stale``    — fetched, and the sitemap's lastmod is STRICTLY
      newer than the fetch time (refetch);
    - ``fresh``    — fetched, and lastmod ≤ fetch time, or the entry
      carries no parseable lastmod (no evidence of change);
    - ``unlisted`` — fetched, but no longer in the sitemap (the
      site delisted it — retention policy decides, not this
      operator).

    Output: one row per canonical URL — (canon_url, status,
    lastmod_ts, fetched_at). Duplicate sitemap listings keep the
    NEWEST parseable lastmod (a URL listed in two sitemap files is
    stale if ANY listing says so); duplicate corpus rows keep the
    newest fetch. Scale shape: both sides aggregate to distinct URL
    keys (one exchange each, on the key a recrawl queue partitions
    by anyway), then one full-outer merge join — no UDF, no
    broadcast assumption (sitemap sets are corpus-sized, not
    dimension-sized)."""
    left = (
        corpus.select(F.col(url_col).alias("canon_url"),
                      F.col(fetched_col).alias("fetched_at"))
        .filter(F.col("canon_url").isNotNull())
        .groupBy("canon_url")
        .agg(F.max("fetched_at").alias("fetched_at"))
    )
    right = (
        entries.select(F.col(loc_col).alias("canon_url"),
                       parse_w3c_datetime(F.col(lastmod_col))
                       .alias("lastmod_ts"))
        .filter(F.col("canon_url").isNotNull()
                & (F.col("canon_url") != ""))
        .groupBy("canon_url")
        .agg(F.max("lastmod_ts").alias("lastmod_ts"))
        .withColumn("_listed", F.lit(True))
    )
    merged = left.join(right, "canon_url", "full_outer")
    status = (
        F.when(F.col("fetched_at").isNull(), "new")
        .when(F.col("_listed").isNull(), "unlisted")
        .when(F.col("lastmod_ts").isNotNull()
              & (F.col("lastmod_ts") > F.col("fetched_at")), "stale")
        .otherwise("fresh")
    )
    return merged.select("canon_url", status.alias("status"),
                         "lastmod_ts", "fetched_at")


def expand_sitemap_indexes(sitemaps: DataFrame, payloads: DataFrame,
                           max_depth: int = 3,
                           domain_col: str = "domain",
                           xml_col: str = "sitemap_xml") -> DataFrame:
    """Bounded-depth ``<sitemapindex>`` expansion: parse the seed
    corpus; each round, ``kind='sitemap'`` rows join ``payloads``
    (``loc`` → fetched ``sitemap_xml`` — the caller's fetch results
    supplied as a DataFrame, the M132/M68 iterative pattern) to form
    the next round's parse input. Returns the UNION of all
    ``kind='url'`` rows across levels with a ``depth`` column
    (0 = found in the seed document).

    ``max_depth`` bounds the driver-side loop — each level is one
    declarative parse + equi-join, so a depth-k expansion is k jobs,
    not k×rows; index rows deeper than ``max_depth`` are dropped (the
    spec forbids index→index nesting beyond one level in practice,
    but defensive crawls see them). A nested sitemap whose loc is
    missing from ``payloads`` simply contributes nothing (inner
    join). Payload loc keys are matched EXACTLY as written in the
    index (post entity-unescape)."""
    pay = payloads.select(F.col("loc").alias("_sm_loc"),
                          F.col(xml_col).alias("_sm_xml"))
    frontier = sitemaps.select(F.col(domain_col).alias("domain"),
                               F.col(xml_col).alias("sitemap_xml"))
    out: DataFrame | None = None
    for depth in range(max_depth + 1):
        parsed = parse_sitemaps(frontier)
        urls = parsed.filter(F.col("kind") == "url") \
            .withColumn("depth", F.lit(depth))
        out = urls if out is None else out.unionByName(urls)
        if depth == max_depth:
            break
        frontier = (
            parsed.filter(F.col("kind") == "sitemap")
            .select("domain", F.col("loc").alias("_sm_loc"))
            .join(pay, "_sm_loc")
            .select("domain", F.col("_sm_xml").alias("sitemap_xml"))
        )
    return out
