"""URL canonicalization expressions — the normalization step of
web-corpus deduplication (the same URL arrives as dozens of surface
variants: tracking params, fragments, case-varying hosts, default
ports, trailing slashes; Common-Crawl-style pipelines canonicalize
BEFORE any content hashing so exact dedup collapses them).

Everything here is a pure JVM expression tree (regexp over strings —
whole-stage codegen, no UDF), mirrored verbatim by the DuckDB oracles;
the replacement patterns deliberately avoid backreferences so the
identical regex text runs on both engines (Java ``$1`` vs RE2 ``\\1``
would otherwise diverge).

Canonicalization contract (applied in order):

1. strip the fragment (``#...``);
2. lowercase the scheme and authority (path/query keep case — they are
   case-sensitive server-side);
3. drop a default port (``:80`` for http, ``:443`` for https);
4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``);
5. strip trailing slashes from the path.

Param re-ordering is deliberately NOT done: ``?a=1&b=2`` vs
``?b=2&a=1`` are left distinct (order can be semantic; the standard
conservative choice).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking params dropped by canonicalization
TRACKING_PARAM_RE = "(utm_[a-zA-Z]+|fbclid|gclid)"

#: authority = everything between :// and the first /, ?, or #
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL column (see module contract)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, "#.*$", "")  # 1. fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    # rest = path?query (everything after the authority)
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    # 3. default ports
    auth = F.when(scheme == "http", F.regexp_replace(auth, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, ":443$", "")).otherwise(auth)
    )
    # 4. tracking params — three backreference-free passes:
    #    a) '&utm_x=v' anywhere (global)  b) leading '?utm_x=v&' -> '?'
    #    c) lone '?utm_x=v' at the end
    rest = F.regexp_replace(rest, f"&{TRACKING_PARAM_RE}=[^&#]*", "")
    rest = F.regexp_replace(rest, f"\\?{TRACKING_PARAM_RE}=[^&#]*&", "?")
    rest = F.regexp_replace(rest, f"\\?{TRACKING_PARAM_RE}=[^&#]*$", "")
    # 5. trailing slash (on a bare path only — not inside a query)
    rest = F.when(
        rest.rlike("\\?"), rest
    ).otherwise(F.regexp_replace(rest, "/+$", ""))
    return (
        F.when(u.isNull(), F.lit(None).cast("string"))
        # scheme-less strings are not URLs: pass through fragment-stripped
        .when(scheme == "", u)
        .otherwise(F.concat(scheme, F.lit("://"), auth, rest))
    )


def url_host(url: Column | str) -> Column:
    """Lowercased host (authority minus any port / userinfo)."""
    u = F.col(url) if isinstance(url, str) else url
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    auth = F.regexp_replace(auth, "^[^@]*@", "")  # userinfo
    return F.regexp_replace(auth, ":[0-9]+$", "")  # port


def url_domain(url: Column | str) -> Column:
    """Registrable-domain approximation: the last two dot-labels of the
    host (``news.example.co.uk -> co.uk`` caveat acknowledged — a full
    public-suffix list is a data file, not an algorithm change)."""
    return F.regexp_extract(url_host(url), "([^.]+\\.[^.]+)$", 1)
