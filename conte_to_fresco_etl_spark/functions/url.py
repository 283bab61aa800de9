"""URL canonicalization expressions — the normalization crawl pipelines
run before URL-level dedup (the cheapest dedup tier: exact URL match
after canonicalization catches re-crawls before any content hashing).

Pure Column expressions (whole-stage codegen, no Python); every rule is
a regexp in the Java∩RE2 pattern subset so a SQL oracle can compute the
identical function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = "^[A-Za-z][A-Za-z0-9+.-]*://"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(c: Column | str) -> Column:
    """Registrable host for grouping/dedup: lowercased, leading
    ``www.`` and any explicit port stripped.  NULL when the value has
    no scheme://host shape."""
    c = _col(c)
    host = F.lower(F.regexp_extract(c, _SCHEME + "([^/?#]+)", 1))
    host = F.regexp_replace(host, ":[0-9]+$", "")
    host = F.regexp_replace(host, "^www\\.", "")
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def url_normalize(c: Column | str) -> Column:
    """Canonical URL: scheme and host lowercased, default ports (:80
    for http, :443 for https) dropped, fragment dropped, tracking
    parameters (``utm_*``, ``fbclid``, ``gclid``) removed with their
    separators repaired, trailing slashes trimmed off non-root paths.
    Rows without a scheme://host shape pass through unchanged."""
    c = _col(c)
    scheme = F.lower(F.regexp_extract(c, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(c, _SCHEME + "([^/?#]+)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    rest = F.regexp_replace(c, _SCHEME + "[^/?#]+", "")
    rest = F.regexp_replace(rest, "#.*$", "")            # fragment
    # tracking params: anchored to their SEPARATOR so 'xfbclid=..' or
    # 'last_utm_x=..' never match mid-name; the separator is consumed
    # with the param, and if the FIRST surviving param is left behind
    # an '&', the fix-up below promotes it to '?' (lookbehind would be
    # cleaner but RE2 — the oracle engine — has none)
    rest = F.regexp_replace(
        rest, "[?&](utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", ""
    )
    rest = F.regexp_replace(rest, "^([^?]*)&", "$1?")     # promote sep
    rest = F.regexp_replace(rest, "[?&]$", "")            # dangling sep
    rest = F.regexp_replace(rest, "/+(\\?|$)", "$1")      # trailing slash
    return F.when(
        scheme == "", c
    ).otherwise(F.concat(scheme, F.lit("://"), host, rest))
