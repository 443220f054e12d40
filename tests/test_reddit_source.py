"""Reddit REST source tests — hermetic via injected transport/clock
(SURVEY.md §2.A A1-A3). Retry/backoff schedule, Retry-After handling,
token cache refresh window, listing parse + early stop, and the full
fetch→CSV pipeline on a recorded payload."""

from __future__ import annotations

import csv
import hashlib
import json
import os

import pytest

from reddit_apache_airflow_postgres_pipeline_spark.config import EngineConfig
from reddit_apache_airflow_postgres_pipeline_spark.plans.pipelines import run_fetch
from reddit_apache_airflow_postgres_pipeline_spark.sources import reddit as R


def _listing(posts: list[dict]) -> bytes:
    return json.dumps({"data": {"children": [{"data": p} for p in posts]}}).encode()


POSTS = [
    {
        "name": "t3_abc", "id": "abc", "created_utc": 1757396563.0, "score": 5,
        "num_comments": 2, "title": "Rome in 3 days\nemail me a@b.com 12345678",
        "author": "navid", "permalink": "/r/ItalyTravel/comments/abc/rome/",
        "subreddit": "ItalyTravel", "link_flair_text": "Itinerary",
    },
    {
        "name": None, "id": "def", "created_utc": 1757396564.0, "score": 1,
        "num_comments": 0, "title": "Florence", "author": "x",
        "permalink": "/r/ItalyTravel/comments/def/fl/", "subreddit": "ItalyTravel",
        "link_flair_text": None,
    },
    {
        "name": "t3_ghi", "id": "ghi", "created_utc": 1757396565.0, "score": 0,
        "num_comments": 0, "title": "Venice", "author": "y",
        "permalink": "/r/ItalyTravel/comments/ghi/ve/", "subreddit": "ItalyTravel",
        "link_flair_text": None,
    },
]


def test_parse_listing_early_stop():
    rows = R.parse_listing(_listing(POSTS), limit=2)
    assert [r["id"] for r in rows] == ["abc", "def"]
    assert rows[0]["created_utc"] == 1757396563.0


def test_fetch_retries_then_succeeds():
    calls, sleeps = [], []
    seq = [(503, {}, b""), (429, {"Retry-After": "7"}, b""), (200, {}, _listing(POSTS))]

    def transport(url, headers):
        calls.append(url)
        return seq[len(calls) - 1]

    src = R.RedditSource(
        "ItalyTravel", limit=10, transport=transport, sleep=sleeps.append,
        rng=__import__("random").Random(0),
    )
    rows = src.fetch_rows()
    assert len(rows) == 3
    assert len(calls) == 3
    # attempt 0: 2s base; attempt 1: max(4s, Retry-After 7s); both + jitter<=1.7
    assert 2.0 <= sleeps[0] <= 2.0 + R.JITTER_MAX_S
    assert 7.0 <= sleeps[1] <= 7.0 + R.JITTER_MAX_S
    assert "www.reddit.com" in calls[0]  # anonymous fallback (no token cache)


def test_fetch_exhausts_attempts():
    def transport(url, headers):
        return (503, {}, b"")

    src = R.RedditSource("s", transport=transport, sleep=lambda s: None)
    with pytest.raises(RuntimeError, match="exhausted 8 attempts"):
        src.fetch_rows()
    # backoff doubles and caps at 64s
    delays = []
    src2 = R.RedditSource("s", transport=transport, sleep=delays.append,
                          rng=__import__("random").Random(0))
    with pytest.raises(RuntimeError):
        src2.fetch_rows()
    bases = [min(2.0 * 2**i, 64.0) for i in range(8)]
    assert all(b <= d <= b + R.JITTER_MAX_S for b, d in zip(bases, delays))


def test_token_cache_refresh_window():
    clock = [1000.0]
    cache = R.OAuthTokenCache("cid", "sec", clock=lambda: clock[0])
    cache._token, cache._expires_at = "tok1", 1000.0 + 3600
    assert cache.get() == "tok1"  # fresh
    clock[0] = 1000.0 + 3600 - 59  # inside the 60s refresh window
    # refresh attempt hits the network and fails in tests → returns None
    assert cache.get() is None
    cache.invalidate()
    assert cache._token is None


def test_authed_fetch_invalidates_token_on_403():
    cache = R.OAuthTokenCache("cid", "sec")
    cache._token, cache._expires_at = "tok", 10**12  # far future
    statuses = [(403, {}, b""), (200, {}, _listing(POSTS[:1]))]
    calls = []

    def transport(url, headers):
        calls.append((url, headers.get("Authorization")))
        return statuses[len(calls) - 1]

    src = R.RedditSource("s", token_cache=cache, transport=transport,
                         sleep=lambda s: None)
    rows = src.fetch_rows()
    assert len(rows) == 1
    assert calls[0][0].startswith("https://oauth.reddit.com/")  # authed first
    assert calls[0][1] == "Bearer tok"
    assert calls[1][1] is None  # token invalidated → anonymous retry
    assert "www.reddit.com" in calls[1][0]


def test_run_fetch_pipeline(spark, tmp_path):
    cfg = EngineConfig(gdpr_salt="test-salt", data_dir=str(tmp_path))
    rows = R.parse_listing(_listing(POSTS), limit=40)
    res = run_fetch(spark, cfg, run_ts="20260813T120000", rows=rows)
    assert res.csv_path.endswith("italytravel_20260813T120000.csv")
    assert res.rows == 3

    got = list(csv.DictReader(open(res.csv_path)))
    assert len(got) == 3
    by_id = {r["id"]: r for r in got}

    def h(v: str) -> str:
        return hashlib.sha256(("test-salt" + v).encode()).hexdigest()

    r0 = by_id[h("abc")]
    assert r0["thing_key"] == h("t3_abc")
    assert r0["author_hash"] == h("navid")
    assert r0["permalink"] == h("https://www.reddit.com/r/ItalyTravel/comments/abc/rome/")
    assert r0["created_at"] == "2025-09-09T05:42:43Z"
    assert "[redacted-email]" in r0["title_sanitized"]
    assert "[redacted-number]" in r0["title_sanitized"]
    assert "\n" not in r0["title_sanitized"]
    # fullname fallback: row with name=None derives t3_def
    assert by_id[h("def")]["thing_key"] == h("t3_def")
    assert by_id[h("def")]["flair_text"] == ""


def test_listing_json_df_matches_driver_parse(spark):
    payload = _listing(POSTS)
    df = R.listing_json_df(spark, [payload])
    got = sorted([r.asDict() for r in df.collect()], key=lambda r: r["id"])
    want = sorted(R.parse_listing(payload, limit=99), key=lambda r: r["id"])
    assert [r["id"] for r in got] == [r["id"] for r in want]
    for g, w in zip(got, want):
        for k in ["name", "title", "author", "permalink", "score",
                  "num_comments", "created_utc", "link_flair_text"]:
            assert g[k] == w[k], (k, g, w)
    # transform chain accepts the json-path relation unchanged
    from reddit_apache_airflow_postgres_pipeline_spark.config import EngineConfig
    from reddit_apache_airflow_postgres_pipeline_spark.plans.pipelines import fetch_transform

    out = fetch_transform(df, EngineConfig(gdpr_salt="test-salt"))
    assert out.count() == 3 and "thing_key" in out.columns


def _paged_listing(posts: list[dict], after: str | None) -> bytes:
    return json.dumps(
        {"data": {"children": [{"data": p} for p in posts], "after": after}}
    ).encode()


def test_paginated_fetch_follows_after_cursor():
    """EXTENSION (VERDICT r01 #9): limit > 100 paginates with the
    data.after cursor, 100/page, early-stopping at limit."""
    pages = {
        None: _paged_listing(
            [dict(POSTS[0], name=f"t3_p1_{i}", id=f"p1_{i}") for i in range(100)],
            "t3_p1_99",
        ),
        "t3_p1_99": _paged_listing(
            [dict(POSTS[0], name=f"t3_p2_{i}", id=f"p2_{i}") for i in range(100)],
            "t3_p2_99",
        ),
        "t3_p2_99": _paged_listing(
            [dict(POSTS[0], name=f"t3_p3_{i}", id=f"p3_{i}") for i in range(100)],
            None,
        ),
    }
    urls = []

    def transport(url, headers):
        urls.append(url)
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(url).query)
        return 200, {}, pages[q.get("after", [None])[0]]

    src = R.RedditSource("s", limit=250, transport=transport, sleep=lambda s: None)
    rows = src.fetch_rows()
    assert len(rows) == 250  # early stop mid-page-3
    assert rows[0]["id"] == "p1_0" and rows[-1]["id"] == "p3_49"
    assert len(urls) == 3
    # page limits: 100, 100, then only the 50 remaining
    from urllib.parse import parse_qs, urlparse

    limits = [parse_qs(urlparse(u).query)["limit"][0] for u in urls]
    assert limits == ["100", "100", "50"]


def test_paginated_fetch_stops_when_listing_exhausted():
    pages = {
        None: _paged_listing(POSTS[:2], "t3_x"),
        "t3_x": _paged_listing([POSTS[2]], None),  # final page, no cursor
    }

    def transport(url, headers):
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(url).query)
        return 200, {}, pages[q.get("after", [None])[0]]

    src = R.RedditSource("s", limit=500, transport=transport, sleep=lambda s: None)
    rows = src.fetch_rows()
    assert [r["id"] for r in rows] == ["abc", "def", "ghi"]


def test_single_request_parity_for_small_limit():
    """Reference parity: limit ≤ 100 stays ONE request with no after
    param (Fetch_reddit.py:116)."""
    urls = []

    def transport(url, headers):
        urls.append(url)
        return 200, {}, _listing(POSTS)

    src = R.RedditSource("s", limit=10, transport=transport, sleep=lambda s: None)
    rows = src.fetch_rows()
    assert len(rows) == 3
    assert len(urls) == 1
    assert "after=" not in urls[0] and "limit=10" in urls[0]
