"""Pinned corpus snapshots: reproducible training data over the
admitted corpus the gate drains write.

The drains persist accepted rows as ``out_dir/batch_id=<i>/`` hive
partitions — append-only provenance, one dir per micro-batch. A
TRAINING RUN needs more than "whatever is in the directory today": it
needs a pinned, verifiable, re-readable corpus version ("run X trained
on snapshot S"), because the directory keeps growing under it and —
since the estate honors right-to-be-forgotten (sinks/forget.py) — can
shrink or mutate in place. This module is that version layer:

- :func:`create_snapshot` — pin the corpus as of a batch: a manifest
  listing each included ``batch_id`` with its row count and an
  order-free content fingerprint (``bit_xor(xxhash64(row))``, a pure
  map-side aggregate). The manifest is decision-sized (one JSON entry
  per batch dir) and written atomically under ``_snapshots/`` (the
  underscore prefix keeps Spark's file listing blind to it).
- :func:`read_snapshot` — read EXACTLY the manifest's batch dirs, by
  explicit path with ``basePath`` so ``batch_id`` survives as a
  partition column. At scale this is the point: a snapshot read never
  lists the (ever-growing) corpus root and never depends on partition
  discovery — the manifest IS the file index, so pruning is by
  construction, not by filter pushdown.
- :func:`verify_snapshot` — the immutability audit: recount + re-
  fingerprint every pinned batch in ONE partition-pruned scan and
  report per-batch divergence. An in-place mutation (a forget sweep
  rewriting a dir that held a forgotten doc) flips ``ok`` to false —
  the documented collision of erasure and reproducibility: the right
  to be forgotten WINS, and the snapshot fails loudly rather than
  silently serving a different corpus under a pinned name.
- :func:`snapshot_diff` — the admitted rows BETWEEN two pins: reads
  only the batch dirs in ``b`` and not in ``a`` (an incremental-
  training feed costs the delta, never a re-scan or an anti-join).

Reference analog: the pipeline's archive step freezes each combine
run's exact input set by moving consumed files to ``archive/``
(Combine_send_to_postgresql.py:202-205) — a run's inputs are pinned by
layout. Snapshots pin by manifest instead, so the SAME files serve
every pin without a copy.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPSHOTS_SUBDIR = "_snapshots"
SNAPSHOT_FORMAT = "corpus-snapshot/v1"


def _snap_path(corpus_dir: str, name: str) -> str:
    if "/" in name or name.startswith("_") or not name:
        raise ValueError(f"invalid snapshot name {name!r}")
    return os.path.join(corpus_dir, SNAPSHOTS_SUBDIR, f"{name}.json")


def _corpus_batch_ids(corpus_dir: str) -> list[int]:
    if not os.path.isdir(corpus_dir):
        return []
    out = []
    for d in os.listdir(corpus_dir):
        if d.startswith("batch_id=") and os.path.isdir(
            os.path.join(corpus_dir, d)
        ):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def _batch_stats(
    spark: SparkSession, corpus_dir: str, batch_ids: list[int]
) -> dict[int, tuple[int, int]]:
    """(rows, fingerprint) per batch dir, computed in ONE job: an
    explicit-path read of exactly the requested dirs, aggregated on the
    partition column. The fingerprint is ``bit_xor(xxhash64(*data
    cols))`` — order-free (xor), overflow-free, and purely map-side
    partial-aggregated, so pinning a 100 TB corpus costs one pruned
    scan with no data-sized shuffle."""
    df = _read_batches(spark, corpus_dir, batch_ids)
    data_cols = sorted(c for c in df.columns if c != "batch_id")
    arg = ", ".join(f"`{c}`" for c in data_cols)
    agg = (
        df.groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.expr(f"bit_xor(xxhash64({arg}))").alias("fp"),
        )
        .collect()
    )
    stats = {int(r["batch_id"]): (int(r["rows"]), int(r["fp"] or 0)) for r in agg}
    # a dir whose parquet holds zero rows still pins (rows=0, fp=0)
    for b in batch_ids:
        stats.setdefault(b, (0, 0))
    return stats


def _read_batches(
    spark: SparkSession, corpus_dir: str, batch_ids: list[int]
) -> DataFrame:
    paths = [os.path.join(corpus_dir, f"batch_id={b}") for b in batch_ids]
    return (
        spark.read.option("basePath", corpus_dir)
        .parquet(*paths)
    )


def create_snapshot(
    spark: SparkSession,
    corpus_dir: str,
    name: str,
    upto_batch: int | None = None,
) -> dict:
    """Pin the corpus under ``name``: every ``batch_id=*`` dir (or only
    those ``<= upto_batch``) with its row count + content fingerprint.
    Atomic (tmp → rename). Re-creating an existing name is idempotent
    iff the manifest would be byte-identical; a DIFFERENT manifest
    under a pinned name is refused — a snapshot name is a version, not
    a pointer. Returns the manifest."""
    ids = _corpus_batch_ids(corpus_dir)
    if upto_batch is not None:
        ids = [b for b in ids if b <= upto_batch]
    if not ids:
        raise ValueError(
            f"no batch_id=* dirs to snapshot under {corpus_dir!r}"
            + (f" with upto_batch={upto_batch}" if upto_batch is not None else "")
        )
    stats = _batch_stats(spark, corpus_dir, ids)
    manifest = {
        "format": SNAPSHOT_FORMAT,
        "name": name,
        "batches": [
            {"batch_id": b, "rows": stats[b][0], "fingerprint": stats[b][1]}
            for b in ids
        ],
    }
    path = _snap_path(corpus_dir, name)
    payload = json.dumps(manifest, sort_keys=True, indent=1)
    if os.path.exists(path):
        with open(path) as f:
            if f.read() == payload:
                return manifest
        raise ValueError(
            f"snapshot {name!r} already exists under {corpus_dir!r} with "
            "DIFFERENT contents — a pinned name must never silently move; "
            "pick a new name (or verify_snapshot to see what changed)"
        )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, path)
    return manifest


def load_manifest(corpus_dir: str, name: str) -> dict:
    path = _snap_path(corpus_dir, name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no snapshot {name!r} under {corpus_dir!r} "
            f"(have: {list_snapshots(corpus_dir)})"
        )
    with open(path) as f:
        manifest = json.load(f)
    if manifest.get("format") != SNAPSHOT_FORMAT:
        raise ValueError(
            f"snapshot {name!r} has format {manifest.get('format')!r}, "
            f"expected {SNAPSHOT_FORMAT!r}"
        )
    return manifest


def list_snapshots(corpus_dir: str) -> list[str]:
    d = os.path.join(corpus_dir, SNAPSHOTS_SUBDIR)
    if not os.path.isdir(d):
        return []
    return sorted(
        f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json")
    )


def read_snapshot(
    spark: SparkSession, corpus_dir: str, name: str, verify: bool = False
) -> DataFrame:
    """The pinned corpus as a DataFrame — exactly the manifest's batch
    dirs, ``batch_id`` retained as a partition column. ``verify=True``
    runs the immutability audit first and raises on any divergence
    (default off: re-fingerprinting on every read is an audit's cost,
    not a read's)."""
    manifest = load_manifest(corpus_dir, name)
    if verify:
        bad = [
            r
            for r in verify_snapshot(spark, corpus_dir, name).collect()
            if not r["ok"]
        ]
        if bad:
            raise ValueError(
                f"snapshot {name!r} failed immutability verification on "
                f"batches {[int(r['batch_id']) for r in bad]} — the corpus "
                "was mutated under the pin (e.g. a forget sweep); this "
                "snapshot can no longer reproduce its corpus"
            )
    ids = [e["batch_id"] for e in manifest["batches"]]
    missing = [
        b
        for b in ids
        if not os.path.isdir(os.path.join(corpus_dir, f"batch_id={b}"))
    ]
    if missing:
        raise ValueError(
            f"snapshot {name!r} pins batch dirs that no longer exist: "
            f"{missing}"
        )
    return _read_batches(spark, corpus_dir, ids)


def verify_snapshot(
    spark: SparkSession, corpus_dir: str, name: str
) -> DataFrame:
    """The immutability audit relation: one row per pinned batch —
    (snapshot, batch_id, rows, rows_actual, ok). ``ok`` requires BOTH
    the row count and the content fingerprint to match; a vanished dir
    reports rows_actual = -1. One partition-pruned scan."""
    manifest = load_manifest(corpus_dir, name)
    ids = [e["batch_id"] for e in manifest["batches"]]
    present = [
        b for b in ids if os.path.isdir(os.path.join(corpus_dir, f"batch_id={b}"))
    ]
    actual = _batch_stats(spark, corpus_dir, present) if present else {}
    rows = []
    for e in manifest["batches"]:
        b = e["batch_id"]
        got = actual.get(b)
        rows.append(
            {
                "snapshot": name,
                "batch_id": b,
                "rows": e["rows"],
                "rows_actual": got[0] if got else -1,
                "ok": bool(
                    got
                    and got[0] == e["rows"]
                    and got[1] == e["fingerprint"]
                ),
            }
        )
    return spark.createDataFrame(
        rows,
        "snapshot string, batch_id int, rows long, rows_actual long, ok boolean",
    )


def snapshot_diff(
    spark: SparkSession, corpus_dir: str, base: str, target: str
) -> DataFrame:
    """Rows admitted between two pins: the batch dirs in ``target``
    and not in ``base``. Requires ``base``'s batch set ⊆ ``target``'s
    (corpus batches are append-only under the drains; a non-nested pair
    means the pins came from different corpora — fail loud, an id-level
    anti-join would silently 'work' and hide that). Reads ONLY the
    delta dirs."""
    mb = load_manifest(corpus_dir, base)
    mt = load_manifest(corpus_dir, target)
    ids_b = {e["batch_id"] for e in mb["batches"]}
    ids_t = {e["batch_id"] for e in mt["batches"]}
    if not ids_b <= ids_t:
        raise ValueError(
            f"snapshot {base!r} pins batches {sorted(ids_b - ids_t)} that "
            f"{target!r} does not — not an append lineage, refusing to diff"
        )
    delta = sorted(ids_t - ids_b)
    if not delta:
        return _read_batches(spark, corpus_dir, sorted(ids_t)).limit(0)
    return _read_batches(spark, corpus_dir, delta)
