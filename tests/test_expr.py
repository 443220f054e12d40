"""Property tests for the tricky expressions (SURVEY.md §5.2): F4 hash
byte-parity with hashlib, F10 falsy-or vs Python `or`, F7 cast-with-default
vs Python int(), F3 sanitize chain vs the reference's regex order."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F
from pyspark.sql import types as T

from reddit_apache_airflow_postgres_pipeline_spark.functions import expr as E

SALT = "test-salt"


def py_hash(val, salt=SALT):
    # _hash_value, Fetch_reddit.py:58-63
    if not val:
        return ""
    return hashlib.sha256((salt + str(val)).encode("utf-8")).hexdigest()


def py_sanitize(title, max_len=300):
    # _sanitize_title, Fetch_reddit.py:44-55
    t = (title or "").replace("\n", " ")
    t = re.sub(r"\s+", " ", t).strip()
    t = re.sub(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[redacted-email]", t)
    t = re.sub(r"[0-9]{7,}", "[redacted-number]", t)
    return t[:max_len]


def _run(spark, values, expr_builder, in_type=T.StringType()):
    schema = T.StructType([T.StructField("v", in_type)])
    df = spark.createDataFrame([(v,) for v in values], schema)
    return [r[0] for r in df.select(expr_builder(F.col("v"))).collect()]


def test_salted_sha256_parity(spark):
    values = ["t3_abc", "hello", "", None, "ünïcode-é", "a" * 500, "t3:xyz"]
    got = _run(spark, values, lambda c: E.salted_sha256(c, SALT))
    assert got == [py_hash(v) for v in values]


def test_sanitize_title_parity(spark):
    values = [
        None,
        "",
        "hello world",
        "line1\nline2\n\nline3",
        "  lots   of\t spaces  ",
        "contact me at foo.bar+1@example.co.uk now",
        "call 12345678901 or 123456",
        "x" * 400,
        "email@ex.com and 99999999 together\nnewline",
        "trailing space after truncation " + "y" * 300,
    ]
    got = _run(spark, values, E.sanitize_title)
    assert got == [py_sanitize(v) for v in values]


def test_falsy_or_matches_python_or(spark):
    rows = [
        ("a", "b"), ("", "b"), (None, "b"), ("", ""), (None, None), ("", None), ("a", ""),
    ]
    df = spark.createDataFrame(rows, "x string, y string")
    got = [r[0] for r in df.select(E.falsy_or("x", "y", default="D")).collect()]
    assert got == [(x or y or "D") for x, y in rows]


def test_safe_int_matches_python_int(spark):
    def py_int(v):
        try:
            return int(v)
        except (TypeError, ValueError):
            return 0

    values = ["3", "", None, "abc", "3.5", " 7 ", "-4", "007"]
    got = _run(spark, values, E.safe_int)
    assert got == [py_int(v) for v in values]


def test_epoch_to_iso(spark):
    import datetime as dt

    def py_iso(v):
        if v is None:
            return None
        return (
            dt.datetime.fromtimestamp(int(v), tz=dt.timezone.utc)
            .isoformat()
            .replace("+00:00", "Z")
        )

    values = [1757397763.0, 0.0, None, 1699999999.9]
    got = _run(spark, values, E.epoch_to_iso, T.DoubleType())
    assert got == [py_iso(v) for v in values]


def test_fullname_fallback(spark):
    rows = [("t3_x", "y"), (None, "y"), ("", "y"), (None, None), ("", "")]
    df = spark.createDataFrame(rows, "name string, id string")
    got = [r[0] for r in df.select(E.fullname_fallback()).collect()]
    assert got == ["t3_x", "t3_y", "t3_y", None, None]


def test_normalize_permalink(spark):
    values = ["/r/Italy/Comments/ABC/", "  /r/x/// ", "", None, "/r/y"]
    got = _run(spark, values, E.normalize_permalink)
    def py_norm(v):
        # _normalize_permalink, Combine_send_to_postgresql.py:49-56
        v = (v or "").strip().lower()
        return re.sub(r"/+$", "", v)
    assert got == [py_norm(v) for v in values]


def test_thing_key_fallback(spark):
    rows = [
        ("k1", "t3", "id1", "/r/x"),   # existing key wins
        ("", "t3", "id1", "/r/x"),     # derive from id
        (None, "t3", "", "/r/x"),      # derive from permalink
        ("", "t3", "", ""),            # nothing → empty (dropped later)
    ]
    df = spark.createDataFrame(rows, "tk string, tt string, id string, pl string")
    got = [
        r[0]
        for r in df.select(
            E.thing_key_fallback("tk", "tt", "id", "pl", SALT)
        ).collect()
    ]
    assert got[0] == "k1"
    assert got[1] == py_hash("t3:id1")
    assert got[2] == py_hash("t3:/r/x")
    assert got[3] == ""


def test_build_url(spark):
    values = ["/r/x/1", "", None]
    got = _run(spark, values, E.build_url)
    assert got == ["https://www.reddit.com/r/x/1", None, None]


def test_canonical_url_rules(spark):
    from pyspark.sql import functions as F

    from reddit_apache_airflow_postgres_pipeline_spark.functions import urls

    cases = [
        # (raw, expected_canon, expected_host)
        ("HTTPS://WWW.Ex.COM:443//a//b/?utm_source=x&b=2&a=1#f",
         "https://www.ex.com/a/b?a=1&b=2", "www.ex.com"),
        ("http://site.org:8080/path/", "http://site.org:8080/path", "site.org"),
        ("https://ex.com", "https://ex.com/", "ex.com"),
        ("http://Ex.Com:80/x?gclid=1&fbclid=2", "http://ex.com/x", "ex.com"),
        ("ftp://files.net//pub", "ftp://files.net/pub", "files.net"),
        ("http://user:pw@host.net:9999/p", "http://host.net:9999/p", "host.net"),
        ("not a url", "", ""),
        (None, "", ""),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i long, u string"
    )
    out = {
        r["i"]: (r["c"], r["h"])
        for r in df.select(
            "i",
            urls.canonical_url("u").alias("c"),
            urls.url_host("u").alias("h"),
        ).collect()
    }
    for i, (_, canon, host) in enumerate(cases):
        assert out[i] == (canon, host), (i, out[i], canon, host)


def test_zorder_key_interleaves_and_validates(spark):
    from pyspark.sql import functions as F

    from reddit_apache_airflow_postgres_pipeline_spark.functions import zorder

    df = spark.createDataFrame(
        [(0b101, 0b011)], "a long, b long"
    )
    got = df.select(zorder.zorder_key(["a", "b"], bits=3).alias("z")).first()["z"]
    # a bits at even positions, b at odd: a=101, b=011 → z = 0b011011... compute:
    # pos0=a0=1, pos1=b0=1, pos2=a1=0, pos3=b1=1, pos4=a2=1, pos5=b2=0
    assert got == 0b011011

    # python-reference cross-check over a grid
    rows = [(x, y) for x in range(8) for y in range(8)]
    df2 = spark.createDataFrame(rows, "a long, b long")
    out = {
        (r["a"], r["b"]): r["z"]
        for r in df2.select("a", "b", zorder.zorder_key(["a", "b"], 3).alias("z")).collect()
    }
    def ref(x, y):
        z = 0
        for j in range(3):
            z |= ((x >> j) & 1) << (2 * j)
            z |= ((y >> j) & 1) << (2 * j + 1)
        return z
    assert all(out[(x, y)] == ref(x, y) for x, y in rows)

    # guards
    for bad in (lambda: zorder.zorder_key(["a"], 3),
                lambda: zorder.zorder_key(["a", "b"], 32)):
        try:
            bad()
        except ValueError:
            pass
        else:
            raise AssertionError("expected ValueError")

    # bucketize clamps
    df3 = spark.createDataFrame([(-5.0,), (0.0,), (99.9,), (100.0,), (250.0,)], "v double")
    vals = [r["b"] for r in df3.select(zorder.bucketize("v", 0.0, 100.0, 10).alias("b")).collect()]
    assert vals == [0, 0, 9, 9, 9]
