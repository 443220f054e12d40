"""Reference-parity scalar expressions (SURVEY.md §2.B, F3-F14).

Every transform in the reference is row-at-a-time Python; all of them are
expressible with built-in Column functions, so this module contains ZERO
UDFs — everything stays inside whole-stage codegen.

The subtle bits, preserved verbatim:

* **Falsy-or** (F10/F11): Python ``a or b`` falls through on empty string,
  not just NULL — plain ``coalesce`` diverges. We chain ``nullif(x, '')``.
* **Salted SHA-256** (F4): must byte-match Python
  ``hashlib.sha256((salt + str(v)).encode('utf-8')).hexdigest()`` and
  return ``''`` (not NULL, not a hash) for NULL/empty input.
* **Sanitize order matters** (F3): newline→space, collapse whitespace,
  trim, redact emails, redact 7+ digit runs, truncate to 300
  (Fetch_reddit.py:44-55).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Redaction regexes — verbatim from Fetch_reddit.py:50-55.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_DIGITS_RE = r"[0-9]{7,}"

# Python's ``\s`` (and ``str.strip()``) character set, spelled out for the
# JVM regex engine: Java ``\s`` is ASCII-only ([ \t\n\x0B\f\r]) and even
# ``(?U)`` diverges on no-break spaces, while the reference's
# ``re.sub(r"\s+", …)`` matches full Unicode whitespace including the
# C0 separators \x1c-\x1f (property-tested parity, F3).
PY_WHITESPACE_RE = (
    "[ \\t\\n\\x0B\\f\\r\\x1c-\\x1f\\x85\\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000]"
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def falsy_or(*cols: Column | str, default: str | None = "") -> Column:
    """Python falsy-``or`` over string columns (F10/F11).

    ``falsy_or(a, b, default='x')`` == Python ``a or b or 'x'`` where empty
    string AND NULL both fall through. Reference: the drift-tolerant reads
    ``post_id or id``, ``permalink or url``, ``title_sanitized or title``
    (Combine_send_to_postgresql.py:82,86,103).
    """
    chain = [F.nullif(_col(c), F.lit("")) for c in cols]
    if default is not None:
        chain.append(F.lit(default))
    return F.coalesce(*chain)


def salted_sha256(col: Column | str, salt: str) -> Column:
    """``sha256(salt + value)`` hex digest; ``''`` for NULL/empty input (F4).

    Byte-parity with ``_hash_value`` (Fetch_reddit.py:58-63,
    Combine_send_to_postgresql.py:58-61): the Python helper returns ``""``
    for falsy input and otherwise hashes the UTF-8 of ``salt + str(val)``.
    ``concat`` NULL-swallowing is guarded by the ``when``.
    """
    c = _col(col)
    return F.when(c.isNull() | (c == ""), F.lit("")).otherwise(
        F.sha2(F.concat(F.lit(salt), c.cast("string")), 256)
    )


def sanitize_title(col: Column | str, max_len: int = 300) -> Column:
    """Title sanitization chain (F3) — exact order of Fetch_reddit.py:44-55.

    newline→space, collapse ``\\s+``, trim, redact emails, redact 7+ digit
    runs, truncate. NULL input → ``''`` (the reference does ``title or ""``).
    """
    c = F.coalesce(_col(col).cast("string"), F.lit(""))
    c = F.regexp_replace(c, r"\n", " ")
    # Python-\s parity (see PY_WHITESPACE_RE); after the collapse only
    # plain spaces remain, so trim == Python str.strip() here
    c = F.regexp_replace(c, PY_WHITESPACE_RE + "+", " ")
    c = F.trim(c)
    c = F.regexp_replace(c, EMAIL_RE, "[redacted-email]")
    c = F.regexp_replace(c, LONG_DIGITS_RE, "[redacted-number]")
    return F.substring(c, 1, max_len)


def epoch_to_iso(col: Column | str) -> Column:
    """Epoch seconds → ISO-8601 ``...Z`` string (F5), NULL-propagating.

    Matches ``datetime.fromtimestamp(v, tz=utc).isoformat().replace('+00:00','Z')``
    (Fetch_reddit.py:144-148). Session timezone is UTC (session.py), so
    ``date_format`` with ``'Z'`` literal is exact for whole seconds.

    Fractional-epoch CONTRACT: the engine truncates to the whole second
    (the Python reference would emit microseconds for a ``.5`` epoch).
    Reddit's ``created_utc`` is float on the wire but integral-valued in
    practice; the choice is pinned by
    tests/test_properties.py::test_epoch_to_iso_property.
    """
    return F.date_format(
        F.timestamp_seconds(_col(col).cast("double").cast("long")),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )


def iso_to_timestamp(col: Column | str) -> Column:
    """Inverse of F5 for the load path: ISO-8601 ``...Z`` text → timestamp.

    Postgres parses the combined CSV's ISO strings into ``timestamptz``
    (README.md:211); empty string → NULL (not epoch 0).
    """
    c = F.nullif(_col(col), F.lit(""))
    return F.to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ssX")


def fullname_fallback(name: Column | str = "name", id_col: Column | str = "id") -> Column:
    """``name or ('t3_' + id if id else None)`` (F6, Fetch_reddit.py:150)."""
    n, i = _col(name), _col(id_col)
    return F.coalesce(
        F.nullif(n, F.lit("")),
        F.when(i.isNotNull() & (i != ""), F.concat(F.lit("t3_"), i)),
    )


def safe_int(col: Column | str, default: int = 0) -> Column:
    """``int(x)`` with fallback default (F7, Combine_send_to_postgresql.py:96-101).

    Python ``int('3.5')`` raises → default; ``try_cast`` to int has the
    same string-strictness. Returns LongType for 100 TB-scale counters.

    Known, accepted divergence from CPython ``int()``: non-ASCII decimal
    digits (``int('٣') == 3``) and digit-group underscores
    (``int('1_0') == 10``) are rejected here → default, as are values
    outside int64 (Python ints are unbounded). The wire formats feeding
    this cast (Reddit JSON, our own CSVs) only ever carry ASCII int32
    counters, so parity is scoped accordingly (property-tested).
    """
    return F.coalesce(F.trim(_col(col).cast("string")).try_cast("long"), F.lit(default))


def build_url(permalink: Column | str) -> Column:
    """``'https://www.reddit.com' + permalink`` when present else NULL (F8)."""
    p = _col(permalink)
    return F.when(
        p.isNotNull() & (p != ""), F.concat(F.lit("https://www.reddit.com"), p)
    )


def normalize_permalink(col: Column | str) -> Column:
    """strip → lower → drop trailing ``/``s; empty→``''`` (F9,
    Combine_send_to_postgresql.py:49-56). Strip matches Python
    ``str.strip()``'s full Unicode whitespace set (PY_WHITESPACE_RE),
    not SQL trim's space-only set."""
    c = F.coalesce(_col(col).cast("string"), F.lit(""))
    stripped = F.regexp_replace(
        c, f"^{PY_WHITESPACE_RE}+|{PY_WHITESPACE_RE}+$", ""
    )
    return F.regexp_replace(F.lower(stripped), "/+$", "")


def thing_key_fallback(
    thing_key: Column | str,
    thing_type: Column | str,
    id_col: Column | str,
    permalink_norm: Column | str,
    salt: str,
) -> Column:
    """Key derivation for rows missing ``thing_key`` (F12,
    Combine_send_to_postgresql.py:89-93).

    ``sha256(salt + f"{thing_type}:{id or permalink_norm}")`` — note the
    COLON format, intentionally different from the primary fullname path
    (``t3_abc``); preserved verbatim per SURVEY.md §1.4. Rows where both id
    and permalink are empty keep an empty key (dropped later by F13).
    """
    tk = F.coalesce(_col(thing_key).cast("string"), F.lit(""))
    ident = falsy_or(id_col, permalink_norm, default="")
    derived = F.when(ident == "", F.lit("")).otherwise(
        F.sha2(
            F.concat(F.lit(salt), _col(thing_type), F.lit(":"), ident), 256
        )
    )
    return F.when(tk != "", tk).otherwise(derived)
