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
