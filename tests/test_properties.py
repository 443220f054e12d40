"""Property-based tests (SURVEY.md §5.2): each tricky expression is
compared against an independent pure-Python implementation of the
reference's row semantics over hypothesis-generated inputs.

One Spark job per example would be minutes-slow, so each hypothesis
example is a BATCH of generated strings evaluated in one DataFrame pass
(max_examples kept small; each example covers hundreds of values).
"""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.functions import expr as E
from reddit_apache_airflow_postgres_pipeline_spark.operators.dedup import dedup_first

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# surrogate-free text (Spark/Arrow reject lone surrogates, as does UTF-8)
text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)
maybe_text = st.one_of(st.none(), text)


def _run(spark, vals, col_expr):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v string"
    )
    rows = df.select("i", col_expr.alias("o")).collect()
    return [r["o"] for r in sorted(rows, key=lambda r: r["i"])]


# --- F4: salted sha256 ----------------------------------------------------


def _py_hash(salt: str, v: str | None) -> str:
    if not v:
        return ""
    return hashlib.sha256((salt + str(v)).encode("utf-8")).hexdigest()


@given(vals=st.lists(maybe_text, min_size=1, max_size=200))
@settings(**SETTINGS)
def test_salted_sha256_property(spark, vals):
    got = _run(spark, vals, E.salted_sha256(F.col("v"), "salt-π"))
    assert got == [_py_hash("salt-π", v) for v in vals]


# --- F3: sanitize chain ---------------------------------------------------


def _py_sanitize(v: str | None, max_len: int = 300) -> str:
    s = (v or "").replace("\n", " ")
    s = re.sub(r"\s+", " ", s)
    s = s.strip()
    s = re.sub(E.EMAIL_RE, "[redacted-email]", s)
    s = re.sub(E.LONG_DIGITS_RE, "[redacted-number]", s)
    return s[:max_len]


dirty = st.text(
    alphabet=st.one_of(
        st.characters(blacklist_categories=("Cs",)),
        st.sampled_from(list("\n\t  @.0123456789abc")),
    ),
    max_size=80,
)


@given(vals=st.lists(st.one_of(st.none(), dirty), min_size=1, max_size=200))
@settings(**SETTINGS)
def test_sanitize_title_property(spark, vals):
    got = _run(spark, vals, E.sanitize_title(F.col("v")))
    want = [_py_sanitize(v) for v in vals]
    assert got == want


# --- F7: int cast with default -------------------------------------------


def _py_safe_int(v: str | None, default: int = 0) -> int:
    try:
        n = int(str(v).strip())
    except (TypeError, ValueError):
        return default
    # engine scope: 64-bit counters; Python's unbounded int out of range
    # → default (expr.safe_int docstring)
    return n if -(2**63) <= n < 2**63 else default


# ASCII-scoped on purpose: CPython int() additionally accepts non-ASCII
# decimal digits and digit-group underscores; the engine documents that
# divergence (wire formats are ASCII) — see expr.safe_int.
num_like = st.one_of(
    st.none(),
    st.integers(-(10**12), 10**12).map(str),
    st.sampled_from(["", " 42 ", "3.5", "abc", "+7", "-0", "1e3", "  ", "9" * 25]),
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20),
)


@given(vals=st.lists(num_like, min_size=1, max_size=200))
@settings(**SETTINGS)
def test_safe_int_property(spark, vals):
    got = _run(spark, vals, E.safe_int(F.col("v")))
    assert got == [_py_safe_int(v) for v in vals]


# --- F9/F10: permalink normalization and falsy-or -------------------------


@given(vals=st.lists(maybe_text, min_size=1, max_size=200))
@settings(**SETTINGS)
def test_normalize_permalink_property(spark, vals):
    got = _run(spark, vals, E.normalize_permalink(F.col("v")))
    want = [re.sub("/+$", "", (v or "").strip().lower()) for v in vals]
    assert got == want


@given(
    pairs=st.lists(st.tuples(maybe_text, maybe_text), min_size=1, max_size=200),
    default=text,
)
@settings(**SETTINGS)
def test_falsy_or_property(spark, pairs, default):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)],
        "i int, a string, b string",
    )
    rows = df.select(
        "i", E.falsy_or("a", "b", default=default).alias("o")
    ).collect()
    got = [r["o"] for r in sorted(rows, key=lambda r: r["i"])]
    assert got == [(a or b or default) for a, b in pairs]


# --- D1: first-wins dedup is exactly min-by-order -------------------------


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),  # key
            st.integers(0, 3),  # file_seq
            st.integers(0, 50),  # row_seq
            st.integers(-(2**63), 2**63 - 1),  # payload (int64 column)
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(**SETTINGS)
def test_dedup_first_property(spark, rows):
    # make (key, file_seq, row_seq) unique — the operator's precondition
    # (the inbox scan's lineage is unique by construction)
    uniq = {(k, f, r): p for k, f, r, p in rows}
    data = [(k, f, r, p) for (k, f, r), p in uniq.items()]
    df = spark.createDataFrame(data, ["k", "file_seq", "row_seq", "p"])
    got = {
        r["k"]: (r["file_seq"], r["row_seq"], r["p"])
        for r in dedup_first(df, "k", ["file_seq", "row_seq"]).collect()
    }
    want: dict[int, tuple[int, int, int]] = {}
    for k, f, r, p in sorted(data, key=lambda t: (t[0], t[1], t[2])):
        want.setdefault(k, (f, r, p))
    assert got == want


# --- F5: epoch → ISO-8601 Z (fractional-epoch contract) -------------------


@given(
    epochs=st.lists(
        st.one_of(
            st.none(),
            st.integers(min_value=0, max_value=4102444800),  # ≤ 2100-01-01
            st.floats(min_value=0, max_value=4102444800,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=200,
    )
)
@settings(**SETTINGS)
def test_epoch_to_iso_property(spark, epochs):
    """Pins the F5 contract (VERDICT r01 wrong #3):

    * integral epochs: byte-equal to the reference's
      datetime.fromtimestamp(v, tz=utc).isoformat().replace('+00:00','Z')
      (Fetch_reddit.py:144-148);
    * fractional epochs: the engine TRUNCATES to the whole second —
      i.e. equals the reference formula applied to int(v). Reddit's
      created_utc is float on the wire but integral-valued in practice;
      sub-second precision is deliberately dropped, and this test is
      the documented contract for that choice.
    * None propagates to NULL.
    """
    import datetime as dt

    df = spark.createDataFrame(
        [(i, float(v) if v is not None else None) for i, v in enumerate(epochs)],
        "i int, v double",
    )
    rows = df.select("i", E.epoch_to_iso(F.col("v")).alias("o")).collect()
    got = [r["o"] for r in sorted(rows, key=lambda r: r["i"])]

    def ref(v):
        if v is None:
            return None
        return (
            dt.datetime.fromtimestamp(int(v), tz=dt.timezone.utc)
            .isoformat()
            .replace("+00:00", "Z")
        )

    assert got == [ref(v) for v in epochs]


# --- token_chunks (round 4) ----------------------------------------------


def _py_chunks(v: str | None, k: int) -> list[str]:
    """Independent reference: non-overlapping k-token chunks of
    lowercased whitespace-split text; < k tokens → whole join as one
    chunk; trailing partial dropped; '' sentinel dropped by callers.

    Mirrors SQL semantics exactly: ``trim`` strips SPACES only (both
    Spark and DuckDB; Python's .strip() would also eat \\r/\\t and
    diverge), regex split keeps leading/trailing empty tokens the way
    Java split(limit=-1) / re.split do, and the whitespace class is
    Java's ASCII-only ``\\s`` — Python's is Unicode-aware and would
    also split on U+0085/U+00A0-family chars the engines keep."""
    toks = re.split(r"[ \t\n\x0b\f\r]+", (v or "").strip(" ").lower())
    if len(toks) < k:
        return [" ".join(toks)]
    return [
        " ".join(toks[i * k : i * k + k]) for i in range(len(toks) // k)
    ]


@given(vals=st.lists(maybe_text, min_size=1, max_size=150))
@settings(**SETTINGS)
def test_token_chunks_property(spark, vals):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.neardup import token_chunks

    k = 4
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v string"
    )
    rows = df.select("i", token_chunks("v", k).alias("o")).collect()
    got = [list(r["o"]) for r in sorted(rows, key=lambda r: r["i"])]
    want = [_py_chunks(v, k) for v in vals]
    # Spark's split(trim(lower())) and Python's re.split agree except
    # both produce the '' chunk for empty docs — compare after the same
    # ''-drop the operators apply
    got = [[c for c in doc if c != ""] for doc in got]
    want = [[c for c in doc if c != ""] for doc in want]
    assert got == want


# --- sliding_chunks: reconstruction + window algebra ----------------------


def _py_sliding(text: str | None, chunk: int, overlap: int):
    import math
    import re as _re

    # mirror Spark exactly: trim strips ASCII spaces only; split uses
    # the Java \s class (NOT Python's Unicode whitespace — \x85/\xa0
    # are tokens chars to Java); leading/trailing empties kept as
    # split(limit=-1) does
    raw = (text or "").strip(" ")
    toks = _re.split("[ \t\n\x0b\f\r]+", raw)
    stride = chunk - overlap
    n = len(toks)
    out = []
    n_chunks = math.ceil(max(n - overlap, 1) / stride)
    for i in range(n_chunks):
        w = toks[i * stride : i * stride + chunk]
        t = " ".join(w)
        if t != "":
            out.append((i, i * stride, len(w), t))
    return out


@given(vals=st.lists(maybe_text, min_size=1, max_size=60))
@settings(**SETTINGS)
def test_sliding_chunks_property(spark, vals):
    from reddit_apache_airflow_postgres_pipeline_spark.operators.chunking import sliding_chunks

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id long, text string"
    )
    got: dict[int, list] = {}
    for r in sliding_chunks(df, chunk_tokens=5, overlap=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_token"], r["n_tokens"], r["chunk_text"])
        )
    for i, v in enumerate(vals):
        expect = _py_sliding(v, 5, 2)
        assert sorted(got.get(i, [])) == sorted(expect), (i, v)


# --- canonical_url: python-reference parity over fuzzed URLs --------------


def _py_canon(u: str | None) -> str:
    import re as _re

    u = u or ""
    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)", u)
    if not m:
        return ""
    scheme = m.group(1).lower()
    auth = m.group(2).split("@")[-1]
    host = auth.split(":")[0].lower()
    if host == "":
        return ""
    pm = _re.search(r":([0-9]+)$", auth)
    port = pm.group(1) if pm else ""
    if (scheme == "http" and port == "80") or (scheme == "https" and port == "443"):
        port = ""
    path = _re.sub(r"/{2,}", "/", m.group(3))
    path = _re.sub(r"(.)/$", r"\1", path) or "/"
    qm = _re.search(r"\?([^#]*)", u)
    params = [
        p
        for p in (qm.group(1).split("&") if qm else [])
        if p != ""
        and not _re.match(r"^(utm_[a-z0-9_]*|gclid|fbclid)=", p.lower())
    ]
    qs = "&".join(sorted(params))
    return (
        f"{scheme}://{host}"
        + (f":{port}" if port else "")
        + path
        + (f"?{qs}" if qs else "")
    )


_url_bits = st.sampled_from(
    ["http", "HTTPS", "ftp", "ex.com", "WWW.Ex.Org", "a.b", "", "80", "443",
     "8080", "/x//y/", "/", "", "a=1", "b=2", "utm_source=z", "gclid=1",
     "#frag", "", "user:pw@"]
)


@given(parts=st.lists(st.tuples(_url_bits, _url_bits, _url_bits, _url_bits,
                                _url_bits, _url_bits), min_size=1, max_size=80))
@settings(**SETTINGS)
def test_canonical_url_property(spark, parts):
    from reddit_apache_airflow_postgres_pipeline_spark.functions import urls

    vals = [
        f"{s}://{ui}{h}{':' + p if p in ('80', '443', '8080') else ''}{pa}?{q1}&{q2}#f"
        for (s, h, p, pa, q1, q2), ui in
        ((t, t[0] and "user:pw@" or "") for t in parts)
    ][:80]
    # also raw junk
    vals += ["not a url", "", "://x", "http:/oops"]
    out = _run(spark, vals, urls.canonical_url(F.col("v")))
    for v, got in zip(vals, out):
        assert got == _py_canon(v), (v, got, _py_canon(v))


# --- sketches: CMS/HLL vs pure-Python references --------------------------


def _py_md5_mod(prefix: str, s: str, m: int) -> int:
    return int(hashlib.md5((prefix + s).encode("utf-8")).hexdigest()[:8], 16) % m


@given(keys=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=300))
@settings(**SETTINGS)
def test_cms_property_matches_python_reference(spark, keys):
    from collections import Counter

    from reddit_apache_airflow_postgres_pipeline_spark.operators import sketches

    d, w = 3, 32
    occ = spark.createDataFrame([(k,) for k in keys], "k string")
    cms = {
        (r["row"], r["col"]): r["c"]
        for r in sketches.cms_build(occ, "k", d=d, w=w).collect()
    }
    ref: dict[tuple[int, int], int] = {}
    for k, n in Counter(keys).items():
        for j in range(d):
            cell = (j, _py_md5_mod(f"cms{j}:", k, w))
            ref[cell] = ref.get(cell, 0) + n
    assert cms == ref
    est = {
        r["k"]: r["est"]
        for r in sketches.cms_estimate(
            sketches.cms_build(occ, "k", d=d, w=w),
            occ.distinct(),
            "k",
            d=d,
            w=w,
        ).collect()
    }
    exact = Counter(keys)
    for k, n in exact.items():
        assert est[k] == min(
            ref[(j, _py_md5_mod(f"cms{j}:", k, w))] for j in range(d)
        )
        assert est[k] >= n


@given(keys=st.lists(st.text(alphabet="xyz01", min_size=1, max_size=5), min_size=1, max_size=200))
@settings(**SETTINGS)
def test_hll_registers_match_python_reference(spark, keys):
    from reddit_apache_airflow_postgres_pipeline_spark.operators import sketches

    p = 5
    m = 1 << p
    occ = spark.createDataFrame([(k,) for k in keys], "k string")
    sk = {
        r["register"]: r["maxrank"]
        for r in sketches.hll_build(occ, "k", p=p).collect()
    }
    ref: dict[int, int] = {}
    for k in set(keys):
        # 60-bit md5-prefix hash (15 hex chars) — see sketches._HLL_BITS
        h = int(hashlib.md5(("hll:" + k).encode("utf-8")).hexdigest()[:15], 16)
        reg, suf = h % m, h >> p
        rank = (60 - p) + 1 if suf == 0 else (60 - p) - suf.bit_length() + 1
        ref[reg] = max(ref.get(reg, 0), rank)
    assert sk == ref


# --- qsketch binning vs Python reference ----------------------------------


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=300,
    )
)
@settings(**SETTINGS)
def test_qsketch_bins_match_python_reference(spark, vals):
    import math

    from reddit_apache_airflow_postgres_pipeline_spark.operators import sketches

    lo, hi, bins = 0.0, 100.0, 16
    width = (hi - lo) / bins
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["bin"]: r["n"]
        for r in sketches.qsketch_build(df, "x", lo, hi, bins).collect()
    }
    ref: dict[int, int] = {}
    for v in vals:
        b = int(math.floor(min(max((v - lo) / width, 0.0), float(bins - 1))))
        ref[b] = ref.get(b, 0) + 1
    assert got == ref


# --- BM25 vs Python reference ---------------------------------------------


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["cat", "dog", "ox", "emu"]), max_size=12),
        min_size=1,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_bm25_matches_python_reference(spark, docs):
    import math
    from decimal import Decimal

    from reddit_apache_airflow_postgres_pipeline_spark.operators.textstats import bm25_scores

    terms = ["cat", "dog"]
    k1, b = 1.2, 0.75
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_matched"], r["score"])
        for r in bm25_scores(df, terms).collect()
    }
    n_docs = len(docs)
    total = sum(len(ws) for ws in docs)
    avgdl = total / n_docs
    dfreq = {
        t: sum(1 for ws in docs if t in ws) for t in terms
    }
    ref = {}
    for i, ws in enumerate(docs):
        dl = len(ws)
        s = Decimal(0)
        matched = 0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log((n_docs - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            term = (idf * (tf * (k1 + 1.0))) / (
                tf + k1 * ((1.0 - b) + b * (dl / avgdl))
            )
            s += Decimal(repr(round(term, 9)))
        if matched:
            ref[i] = (matched, round(float(s), 6))
    assert got == ref
