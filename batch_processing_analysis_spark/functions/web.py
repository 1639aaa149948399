"""URL parsing / canonicalization / registered-domain extraction
(M154) — the domain-level governance primitives a web-scale training
corpus needs (per-domain quotas, domain blocklists, URL-level dedup
all key on these).

Engine rules, enforced here:

- **Pure codegen**: every function is a composition of built-in
  string/regexp expressions (``regexp_extract`` / ``lower`` /
  ``concat``) — no UDF, no Python in the hot path; a 100 TB URL
  column parses inside whole-stage codegen and prunes/pushes down
  like any other projection.
- **Oracle-parity regexps**: the patterns stay inside the
  Java-regex ∩ RE2 common subset (no lookaround, no backrefs) so the
  SAME pattern strings run verbatim in the DuckDB oracle twin
  (plans/queries_text.py:q169).

Semantics (pinned; RFC 3986 terminology):

- ``url_scheme``/``url_host`` lowercase (scheme and host are
  case-insensitive per RFC 3986 §6.2.2.1); userinfo (``user@``) is
  stripped from the host; ``url_port`` is the explicit port or NULL.
- ``url_path`` is the raw path ('' when absent), ``url_query`` the
  raw query without '?' ('' when absent) — both case-SENSITIVE (path
  and query are, per the RFC).
- ``url_canonicalize``: lowercased scheme/host, userinfo kept (it is
  identifying), default ports dropped (http:80, https:443), empty
  path → '/', query kept verbatim, fragment dropped (RFC 3986 §3.5 —
  fragments never reach the server).
- ``registered_domain``: last two host labels, or last THREE when
  the two-label tail is a pinned second-level public suffix
  (co.uk-style; the pinned set below covers the common ccTLD
  registries — a full publicsuffix.org list drops in as data, same
  plan shape: it's one broadcast join or a longer alternation).
  Dotless hosts (``localhost``) return themselves; IPv4 literals
  return the full address (a /8 is not a "domain").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Patterns shared verbatim with the DuckDB oracle (Java regex ∩ RE2).
SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# query = after the FIRST '?' that precedes any '#' — [^#?]* pins the
# match before the fragment, so a '?' INSIDE the fragment ("/p#sec?x")
# never leaks into the query (fragments are dropped per RFC 3986 §3.5)
QUERY_RE = r"^[^#?]*\?([^#]*)"
PORT_RE = r":([0-9]+)$"
IPV4_RE = r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"

# Pinned second-level public suffixes (see module docstring).
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "com.sg", "com.tr", "co.za",
)
SUFFIX_TAIL_RE = ("\\.(" + "|".join(s.replace(".", "\\.")
                                    for s in SECOND_LEVEL_SUFFIXES) + ")$")
LAST2_RE = r"([^.]+\.[^.]+)$"
LAST3_RE = r"([^.]+\.[^.]+\.[^.]+)$"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, '' for scheme-less strings."""
    return F.lower(F.regexp_extract(url, SCHEME_RE, 1))


def _authority(url: Column) -> Column:
    return F.regexp_extract(url, AUTHORITY_RE, 1)


def url_host(url: Column) -> Column:
    """Lowercased host: authority minus userinfo and port."""
    hostport = F.regexp_replace(_authority(url), r"^[^@]*@", "")
    return F.lower(F.regexp_replace(hostport, PORT_RE, ""))


def url_port(url: Column) -> Column:
    """Explicit port as int, NULL when absent."""
    p = F.regexp_extract(_authority(url), PORT_RE, 1)
    return F.when(p != "", p.cast("int"))


def url_path(url: Column) -> Column:
    """Raw path, '' when absent (case-sensitive, not normalized)."""
    return F.regexp_extract(url, PATH_RE, 1)


def url_query(url: Column) -> Column:
    """Raw query without the '?', '' when absent."""
    return F.regexp_extract(url, QUERY_RE, 1)


def url_canonicalize(url: Column) -> Column:
    """Canonical form (see module docstring); NULL-scheme inputs
    (not scheme://-shaped) canonicalize to NULL rather than a fake."""
    scheme = url_scheme(url)
    auth = _authority(url)
    userinfo = F.regexp_extract(auth, r"^([^@]*@)", 1)  # kept verbatim
    host = url_host(url)
    port = url_port(url)
    keep_port = F.when(
        port.isNotNull()
        & ~((scheme == "http") & (port == 80))
        & ~((scheme == "https") & (port == 443)),
        F.concat(F.lit(":"), port.cast("string")),
    ).otherwise("")
    path = url_path(url)
    path = F.when(path == "", "/").otherwise(path)
    query = url_query(url)
    query = F.when(query == "", "").otherwise(F.concat(F.lit("?"), query))
    return F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), userinfo, host, keep_port, path,
                 query),
    )


def registered_domain(host: Column) -> Column:
    """Registrable domain of a lowercase host (see module docstring).

    One trailing dot (the RFC-valid FQDN-root form, ``example.com.``)
    is stripped first — otherwise the last-label regexps cannot match
    and every root-form host would collapse into the '' domain,
    bypassing blocklists keyed on the normal form."""
    host = F.regexp_replace(host, r"\.$", "")
    return (
        F.when(host.rlike(IPV4_RE) | ~host.contains("."), host)
        .when(host.rlike(SUFFIX_TAIL_RE),
              F.regexp_extract(host, LAST3_RE, 1))
        .otherwise(F.regexp_extract(host, LAST2_RE, 1))
    )


def remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 dot-segment removal for a ROOTED path (the
    only form reference resolution produces here — every merge
    attaches to a base path that starts with '/').

    Spark-first shape: the spec's input/output-buffer loop becomes a
    single ``aggregate`` (HOF fold) over the split segments — '.' is
    skipped, '..' pops the stack (clamped at the root, so
    '/../../a' → '/a' like the spec), anything else pushes — then
    one array_join. Pure codegen, exact at ANY nesting depth (no
    bounded unroll); a trailing '/', '/.' or '/..' keeps the
    directory form's trailing slash (§5.2.4 steps 2B/2C)."""
    segs = F.split(path, "/")
    # empty segments are SKIPPED (interior '//' collapses) — the
    # stdlib-urljoin behavior this function is fuzz-pinned against
    # (CPython filters "redundant slashes" from the resolved path, a
    # deliberate deviation from a literal §5.2.4 read); the trailing
    # directory slash is restored below
    stack = F.aggregate(
        segs,
        F.array(F.lit("")).cast("array<string>"),  # the root marker
        lambda acc, x: (
            F.when((x == ".") | (x == ""), acc)
            .when(x == "..",
                  F.when(F.size(acc) > 1,
                         F.slice(acc, 1, F.size(acc) - 1))
                  .otherwise(acc))
            .otherwise(F.concat(acc, F.array(x)))
        ),
    )
    joined = F.array_join(stack, "/")
    needs_slash = path.rlike(r"(/\.\.|/\.|/)$")
    return (
        F.when(joined == "", F.when(needs_slash | (path != ""), "/")
               .otherwise(""))
        .when(needs_slash & ~joined.endswith("/"),
              F.concat(joined, F.lit("/")))
        .otherwise(joined)
    )


def url_resolve(base: Column, ref: Column) -> Column:
    """RFC 3986 §5.2.2 reference resolution — turn an ``href`` into an
    absolute URL against the page's base URL (the crawl-frontier
    expansion primitive; output feeds ``url_canonicalize`` which owns
    port/case normalization).

    Cases, in spec order: a ref with its OWN scheme returns verbatim
    (matching stdlib ``urljoin``, which skips §5.2.4 normalization
    there — pinned by the fuzz test); ``//authority…`` inherits the
    base scheme; ``/rooted`` replaces the path; ``''`` and ``#frag``
    return the base (fragments are dropped engine-wide, §3.5);
    ``?query`` replaces the base query; anything else merges onto the
    base directory and normalizes dot segments. NULL when the base is
    not scheme://-shaped and the ref is not absolute.

    Documented deviation from stdlib: CPython's ``urljoin`` filters
    interior empty segments in MERGED relative refs but preserves
    them in rooted refs (and there lets ``..`` pop an empty segment)
    — an internal inconsistency this function does not replicate;
    empty segments collapse uniformly in both forms. The fuzz test
    pins byte-equality with ``urljoin`` everywhere except that one
    class, which it pins explicitly against OUR semantics."""
    b_scheme = url_scheme(base)
    b_auth = _authority(base)
    b_path = url_path(base)
    b_query = url_query(base)
    r_scheme = F.regexp_extract(ref, SCHEME_RE[:-2], 1)  # no '//' needed
    prefix = F.concat(b_scheme, F.lit("://"), b_auth)
    ref_nf = F.regexp_replace(ref, r"#.*$", "")  # fragments never resolve
    r_path = F.regexp_extract(ref_nf, r"^([^?]*)", 1)
    r_query = F.regexp_extract(ref_nf, r"\?(.*)$", 1)
    q_of = F.when(r_query != "", F.concat(F.lit("?"), r_query)) \
        .otherwise("")
    base_dir = F.regexp_extract(b_path, r"^(.*/)", 1)
    merged = F.concat(
        F.when(base_dir == "", "/").otherwise(base_dir), r_path)
    resolved = (
        F.when(r_scheme != "", ref)
        .when(ref_nf.startswith("//"), F.concat(b_scheme, F.lit(":"),
                                                ref_nf))
        .when(ref_nf == "",
              F.concat(prefix, b_path,
                       F.when(b_query != "",
                              F.concat(F.lit("?"), b_query))
                       .otherwise("")))
        .when(ref_nf.startswith("?"),
              F.concat(prefix, b_path, ref_nf))
        .when(ref_nf.startswith("/"),
              F.concat(prefix, remove_dot_segments(r_path), q_of))
        .otherwise(F.concat(prefix, remove_dot_segments(merged), q_of))
    )
    return F.when((b_scheme != "") | (r_scheme != ""), resolved)
