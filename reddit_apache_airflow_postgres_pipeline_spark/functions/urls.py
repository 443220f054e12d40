"""URL canonicalization — the normalize-before-dedup step a web-crawl
corpus pipeline (CCNet-style) runs so that trivially-different URLs of
the same resource collapse to one key.

Rules applied by :func:`canonical_url` (each a pure Column expression —
codegen, no UDF; the DuckDB oracle in plans/registry_curation.py
re-derives the same semantics with list_filter/list_sort):

* scheme and host lowercased
* default ports dropped (http:80, https:443); other ports kept
* duplicate slashes in the path collapsed; trailing slash stripped
  (a bare authority canonicalizes to path ``/``)
* fragment dropped
* tracking params removed (``utm_*``, ``gclid``, ``fbclid``)
* remaining query params sorted lexicographically (param order is not
  semantic for the overwhelming majority of endpoints; sorting makes
  the key deterministic)

Non-goals (documented, not silent): no percent-encoding
normalization, no IDN/punycode, no www-stripping — those change
identity semantics and belong to a site-specific policy layer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = ("gclid", "fbclid")


def url_scheme(col: Column | str) -> Column:
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    return F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def _authority(col: Column | str) -> Column:
    """host[:port] — the authority with any userinfo@ prefix dropped."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    auth = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    return F.regexp_extract(auth, r"([^@]*)$", 1)


def url_host(col: Column | str) -> Column:
    """Lowercased host without port or userinfo (or '' if the URL has
    no ``scheme://`` authority)."""
    return F.lower(F.regexp_extract(_authority(col), r"^([^:]*)", 1))


def _url_port(col: Column | str) -> Column:
    return F.regexp_extract(_authority(col), r":([0-9]+)$", 1)


def _clean_query(col: Column | str) -> Column:
    """Sorted '&'-joined params with tracking params and empties
    removed ('' if nothing survives)."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    q = F.regexp_extract(c, r"\?([^#]*)", 1)
    keep = F.filter(
        F.split(q, "&"),
        lambda p: (p != "")
        & ~F.lower(p).rlike(
            "^(" + "|".join([f"{x}[a-z0-9_]*" for x in _TRACKING_PREFIXES]
                            + list(_TRACKING_EXACT)) + ")="
        ),
    )
    return F.array_join(F.array_sort(keep), "&")


def canonical_url(col: Column | str) -> Column:
    """The canonical form (see module docstring). URLs without a
    ``scheme://`` prefix canonicalize to '' — the caller's cue to
    quarantine, mirroring the safe-cast convention elsewhere."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    scheme = url_scheme(c)
    host = url_host(c)
    port = _url_port(c)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(raw_path, "/{2,}", "/")
    path = F.regexp_replace(path, "(.)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = _clean_query(c)
    q_part = F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))
    return F.when(
        (scheme == "") | (host == ""), F.lit("")
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path, q_part))
