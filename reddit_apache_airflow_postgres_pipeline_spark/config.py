"""Typed engine configuration with env-var parity to the reference.

The reference configures both DAGs through environment variables
(Fetch_reddit.py:22-40, Combine_send_to_postgresql.py:19-29,
README.md:250-267 — SURVEY.md §2.G O5). We honor the same names; a single
``EngineConfig`` replaces the two per-file constant blocks.

Quirk preserved on purpose (SURVEY.md §1.4): the reference has TWO default
salts — a random per-process one in the fetcher and ``"dev-salt-change-me"``
in the combiner. Consistent hashing requires the env var; we default to the
combiner's deterministic value so tests are reproducible, and document that
production must set ``GDPR_SALT``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass(frozen=True)
class EngineConfig:
    # Fetch (Fetch_reddit.py:22-40)
    subreddit: str = field(default_factory=lambda: _env("SUBREDDIT", "ItalyTravel"))
    limit: int = field(default_factory=lambda: int(_env("LIMIT", "40")))
    gdpr_salt: str = field(default_factory=lambda: _env("GDPR_SALT", "dev-salt-change-me"))
    data_dir: str = field(default_factory=lambda: _env("DATA_DIR", "/tmp/reddit-data"))
    cron_schedule: str = field(default_factory=lambda: _env("CRON_SCHEDULE", "*/10 * * * *"))

    # Combine/load (Combine_send_to_postgresql.py:19-29)
    combine_dir: str = field(default_factory=lambda: _env("COMBINE_DIR", "/tmp/reddit-data/combined"))
    loaded_dir: str = field(default_factory=lambda: _env("LOADED_DIR", "/tmp/reddit-data/loaded"))
    csv_glob_prefix: str = field(default_factory=lambda: _env("CSV_GLOB_PREFIX", "italytravel_"))
    combine_schedule: str = field(default_factory=lambda: _env("COMBINE_SCHEDULE", "5 * * * *"))

    # Postgres target (README.md:250-267)
    pg_host: str = field(default_factory=lambda: _env("PG_HOST", "localhost"))
    pg_port: int = field(default_factory=lambda: int(_env("PG_PORT", "5432")))
    pg_db: str = field(default_factory=lambda: _env("PG_DB", "reddit"))
    pg_user: str = field(default_factory=lambda: _env("PG_USER", "postgres"))
    pg_password: str = field(default_factory=lambda: _env("PG_PASSWORD", ""))
    pg_schema: str = field(default_factory=lambda: _env("PG_SCHEMA", "reddit_schema"))
    pg_table: str = field(default_factory=lambda: _env("PG_TABLE", "redit_table"))

    # Sanitization knobs (Fetch_reddit.py:44-55)
    title_max_len: int = 300

    # Engine extension (no reference analog): first-wins dedup strategy
    # for the combine pipeline. "window" = ROW_NUMBER form (parity
    # default, rank materialized per row); "agg" = min_by hash-aggregate
    # form — map-side partial combine, the lower-shuffle choice at
    # 100 TB. Both are oracle-equivalent (tests/test_pipeline.py).
    dedup_strategy: str = field(default_factory=lambda: _env("DEDUP_STRATEGY", "window"))

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:postgresql://{self.pg_host}:{self.pg_port}/{self.pg_db}"
