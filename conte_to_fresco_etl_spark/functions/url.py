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
    # Split path/query STRUCTURALLY (textual separator surgery is not
    # idempotent on junk paths containing '&'), clean each, rebuild.
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    path = F.regexp_replace(path, "/+$", "")             # trailing slash
    query = F.regexp_extract(rest, "[?](.*)$", 1)
    # pad with '&' so EVERY param is separator-prefixed, making one
    # global pass complete even for consecutive tracking params; the
    # anchor also keeps 'xfbclid=..'/'last_utm_x=..' from matching
    # mid-name (RE2 — the oracle engine — has no lookbehind)
    q = F.concat(F.lit("&"), query)
    q = F.regexp_replace(q, "&(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&]*", "")
    q = F.regexp_replace(q, "^&+", "")
    q = F.regexp_replace(q, "&+$", "")
    rest = F.when(q == "", path).otherwise(
        F.concat(path, F.lit("?"), q)
    )
    return F.when(
        scheme == "", c
    ).otherwise(F.concat(scheme, F.lit("://"), host, rest))
