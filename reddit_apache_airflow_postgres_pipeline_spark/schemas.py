"""Explicit StructType schemas for every dataset the engine touches.

The reference is schema-on-read (CSV all-string) with fixed declared
schemas at the sinks (Fetch_reddit.py:220-233, Combine_send_to_postgresql.py:34-46,
README.md:207-220 — SURVEY.md §1.3). We declare everything up front;
CSV reads use the all-string schema then typed casts (expr F7).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Column order is part of the contract: the reference's COPY column list
# depends on it (Combine_send_to_postgresql.py:233-236).
DB_COLUMNS: list[str] = [
    "thing_key",
    "thing_type",
    "id",
    "created_at",
    "score",
    "num_comments",
    "title_sanitized",
    "author_hash",
    "permalink",
    "subreddit",
    "flair_text",
]

# Columns updated on PK conflict (Combine_send_to_postgresql.py:239-249,
# README.md:188-195); the rest of the row is preserved.
UPSERT_UPDATE_COLUMNS: list[str] = [
    "score",
    "num_comments",
    "title_sanitized",
    "subreddit",
    "flair_text",
]

# One element of the Reddit listing's data.children[].data as consumed by
# the fetcher (Fetch_reddit.py:140-168; FIXTURES.md §1).
REDDIT_RAW = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("created_utc", T.DoubleType()),
        T.StructField("score", T.IntegerType()),
        T.StructField("num_comments", T.IntegerType()),
        T.StructField("title", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("permalink", T.StringType()),
        T.StructField("subreddit", T.StringType()),
        T.StructField("link_flair_text", T.StringType()),
    ]
)

# Full Reddit listing envelope {data:{children:[{data:{...}}]}} for
# spark.read.json over raw API payloads (SURVEY.md §1.1).
REDDIT_LISTING = T.StructType(
    [
        T.StructField(
            "data",
            T.StructType(
                [
                    T.StructField(
                        "children",
                        T.ArrayType(
                            T.StructType([T.StructField("data", REDDIT_RAW)])
                        ),
                    ),
                    T.StructField("after", T.StringType()),
                ]
            ),
        )
    ]
)

# The 11-column per-run CSV written by the fetch pipeline — all strings,
# empty string for missing (FIXTURES.md §2).
FETCH_CSV = T.StructType([T.StructField(c, T.StringType()) for c in DB_COLUMNS])

# Gen-1 producer schema (drift variant; FIXTURES.md §3) — read with the
# same all-string approach; the drift view (expr.falsy_or) reconciles it.
LEGACY_CSV = T.StructType(
    [T.StructField(c, T.StringType()) for c in
     ["id", "author", "title", "score", "num_comments", "created_at", "permalink"]]
)

# Typed target relation (README.md:207-220; FIXTURES.md §5). LongType for
# counters per the 100 TB posture (SURVEY.md §1.2).
TARGET_TABLE = T.StructType(
    [
        T.StructField("thing_key", T.StringType(), nullable=False),
        T.StructField("thing_type", T.StringType(), nullable=False),
        T.StructField("id", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("score", T.LongType()),
        T.StructField("num_comments", T.LongType()),
        T.StructField("title_sanitized", T.StringType()),
        T.StructField("author_hash", T.StringType()),
        T.StructField("permalink", T.StringType()),
        T.StructField("subreddit", T.StringType()),
        T.StructField("flair_text", T.StringType()),
    ]
)
