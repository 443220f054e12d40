"""Pipeline compositions — the reference's three entry points re-expressed
as lazy DataFrame plans (SURVEY.md §3).

``fetch_transform``  : raw Reddit rows → 11-column hashed/sanitized relation
                       (DAG 1 body, Fetch_reddit.py:140-258).
``normalize_rows``   : drift-tolerant CSV rows → normalized relation
                       (``_normalize_row``, Combine_send_to_postgresql.py:81-120).
``combine_pipeline`` : inbox scan → normalize → first-wins dedup → DB_COLUMNS
                       projection (task ``combine_csvs``, §3.2).
``run_combine``      : materializing runner with the reference's fail-the-run
                       + archive side effects (O7/A11).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reddit_apache_airflow_postgres_pipeline_spark.config import EngineConfig
from reddit_apache_airflow_postgres_pipeline_spark.functions import expr as E
from reddit_apache_airflow_postgres_pipeline_spark.operators.dedup import dedup_first, dedup_first_agg
from reddit_apache_airflow_postgres_pipeline_spark.schemas import DB_COLUMNS
from reddit_apache_airflow_postgres_pipeline_spark.sinks.archive import archive_files
from reddit_apache_airflow_postgres_pipeline_spark.sinks.csv import write_atomic_csv
from reddit_apache_airflow_postgres_pipeline_spark.sources.files import read_csv_inbox


def _ensure_cols(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add missing columns as NULL string so drift variants project cleanly."""
    for c in cols:
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    return df


def fetch_transform(raw: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Raw listing rows (schemas.REDDIT_RAW) → the 11-column fetch CSV
    relation, all strings (Fetch_reddit.py:140-168 projection + :242-250
    hashing + :44-55 sanitize). Hashed: thing_key(name), id, author,
    permalink-URL; NOT hashed: subreddit, title, flair, timestamps, counts
    (README.md:328-329)."""
    salt = cfg.gdpr_salt
    name = E.fullname_fallback("name", "id")
    url = E.build_url("permalink")
    return raw.select(
        E.salted_sha256(name, salt).alias("thing_key"),
        F.lit("t3").alias("thing_type"),
        E.salted_sha256(F.col("id"), salt).alias("id"),
        F.coalesce(E.epoch_to_iso("created_utc"), F.lit("")).alias("created_at"),
        F.coalesce(F.col("score").cast("string"), F.lit("")).alias("score"),
        F.coalesce(F.col("num_comments").cast("string"), F.lit("")).alias("num_comments"),
        E.sanitize_title("title", cfg.title_max_len).alias("title_sanitized"),
        E.salted_sha256(F.col("author"), salt).alias("author_hash"),
        E.salted_sha256(url, salt).alias("permalink"),
        E.falsy_or("subreddit", default=cfg.subreddit).alias("subreddit"),
        F.coalesce(F.col("link_flair_text"), F.lit("")).alias("flair_text"),
    )


def normalize_rows(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """``_normalize_row`` (Combine_send_to_postgresql.py:81-120) as one
    projection: drift coalescing (F10), defaults (F11), permalink
    normalization (F9), key fallback (F12), int casts (F7), key-required
    filter (F13), DB_COLUMNS order (F14). Input columns are all-string;
    lineage columns pass through untouched."""
    df = _ensure_cols(
        df, ["thing_key", "thing_type", "post_id", "id", "permalink", "url",
             "created_at", "author_hash", "score", "num_comments",
             "title_sanitized", "title", "subreddit", "flair_text"]
    )
    ident = E.falsy_or("post_id", "id")  # F10: post_id | id
    permalink_raw = E.falsy_or("permalink", "url")  # F10: permalink | url
    permalink_norm = E.normalize_permalink(permalink_raw)
    thing_type = E.falsy_or("thing_type", default="t3")  # F11
    thing_key = E.thing_key_fallback(
        "thing_key", thing_type, ident, permalink_norm, cfg.gdpr_salt
    )  # F12
    passthrough = [c for c in df.columns if c.startswith("_") or c in ("file_seq", "row_seq")]
    out = df.select(
        thing_key.alias("thing_key"),
        thing_type.alias("thing_type"),
        ident.alias("id"),
        E.falsy_or("created_at", default="").alias("created_at"),
        E.safe_int("score").cast("string").alias("score"),  # F7, kept as string (CSV contract)
        E.safe_int("num_comments").cast("string").alias("num_comments"),
        E.falsy_or("title_sanitized", "title", default="").alias("title_sanitized"),
        E.falsy_or("author_hash", default="").alias("author_hash"),
        permalink_norm.alias("permalink"),
        E.falsy_or("subreddit", default=cfg.subreddit).alias("subreddit"),
        E.falsy_or("flair_text", default="").alias("flair_text"),
        *[F.col(c) for c in passthrough],
    )
    return out.filter(F.length("thing_key") > 0)  # F13


def combine_pipeline(
    df: DataFrame, cfg: EngineConfig, dedup_strategy: str | None = None
) -> DataFrame:
    """normalize → first-wins dedup on (file_seq, row_seq) → DB_COLUMNS.

    ``dedup_strategy`` (default: ``cfg.dedup_strategy``) picks the D1
    execution form: ``"window"`` (ROW_NUMBER, parity default) or
    ``"agg"`` (``min_by(struct(payload), struct(file_seq, row_seq))``
    hash aggregate — map-side partial combine halves shuffle volume at
    scale). Identical results: (file_seq, row_seq) is a total order."""
    strategy = dedup_strategy or cfg.dedup_strategy
    normalized = normalize_rows(df, cfg)
    if strategy == "agg":
        deduped = dedup_first_agg(
            normalized,
            "thing_key",
            F.struct("file_seq", "row_seq"),
            payload_cols=[c for c in DB_COLUMNS if c != "thing_key"],
        )
    elif strategy == "window":
        deduped = dedup_first(normalized, "thing_key", ["file_seq", "row_seq"])
    else:
        raise ValueError(f"unknown dedup_strategy: {strategy!r}")
    return deduped.select(*DB_COLUMNS)


@dataclass(frozen=True)
class FetchResult:
    csv_path: str
    rows: int


def run_fetch(
    spark: SparkSession,
    cfg: EngineConfig,
    run_ts: str,
    rows: list | None = None,
) -> FetchResult:
    """Materializing runner for §3.1 (DAG 1): fetch → hash/sanitize →
    run-stamped atomic CSV. ``rows`` injects recorded listing rows
    (fixture mode); when None, the live RedditSource fetches
    (Fetch_reddit.py:261-276 semantics). ``run_ts`` is injected (A7)."""
    import os

    from reddit_apache_airflow_postgres_pipeline_spark.sources.reddit import (
        RedditSource,
        reddit_listing_df,
    )

    if rows is None:
        rows = RedditSource(cfg.subreddit, cfg.limit).fetch_rows()
    raw = reddit_listing_df(spark, rows)
    out = fetch_transform(raw, cfg)
    dest = os.path.join(cfg.data_dir, f"italytravel_{run_ts}.csv")
    write_atomic_csv(out, dest, single_file=True)
    return FetchResult(dest, len(rows))


@dataclass(frozen=True)
class CombineResult:
    combined_path: str
    rows: int
    used_files: list[str]
    archived: list[str]
    # O6 observability: plan-side metrics captured by df.observe() during
    # the count action — no extra job, no extra scan.
    rows_scanned: int = 0
    rows_deduped_or_dropped: int = 0


def run_combine(
    spark: SparkSession,
    cfg: EngineConfig,
    run_ts: str,
) -> CombineResult:
    """Materializing runner for §3.2 with the reference's side-effect
    contract: no CSVs → error; zero valid rows → archive then error (O7,
    Combine_send_to_postgresql.py:129-130, 169-176); all scanned files
    archived after the write (A11). ``run_ts`` is INJECTED (A7 — plans
    never call now())."""
    import os

    from pyspark.sql import Observation

    scan = read_csv_inbox(spark, cfg.data_dir, cfg.csv_glob_prefix)
    if not scan.files and not scan.skipped:
        raise FileNotFoundError(f"no CSV files found in {cfg.data_dir}")
    # O6: observe() rides the count action — scanned/dropped metrics with
    # zero extra jobs (the reference logs the same counts,
    # Combine_send_to_postgresql.py:202-205)
    obs = Observation("combine")
    observed = scan.df.observe(obs, F.count(F.lit(1)).alias("rows_scanned"))
    combined = combine_pipeline(observed, cfg)
    dest = os.path.join(cfg.combine_dir, f"italytravel_combined_{run_ts}.csv")
    n = combined.count()
    metrics = obs.get if n >= 0 else {}
    scanned = int(metrics.get("rows_scanned", 0))
    if n == 0:
        archive_files(scan.files + scan.skipped, cfg.loaded_dir)
        raise ValueError("no valid rows found in any CSV file")
    write_atomic_csv(combined, dest, single_file=True)
    archived = archive_files(scan.files + scan.skipped, cfg.loaded_dir)
    return CombineResult(
        dest, n, scan.files, archived,
        rows_scanned=scanned,
        rows_deduped_or_dropped=scanned - n if scanned >= n else 0,
    )
