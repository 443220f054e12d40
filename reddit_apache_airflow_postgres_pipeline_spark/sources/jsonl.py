"""Line-delimited JSON (JSONL) source/sink.

The reference ingests REST JSON and emits CSV (Fetch_reddit.py:139-156);
JSONL is the missing third format and the lingua franca of training-data
corpora (one document object per line, splittable, append-friendly).

Scale contract:

* **Explicit schema, always.** Schema inference reads the data twice —
  a full extra pass over 100 TB. Every reader here takes a
  ``StructType`` and passes it straight to the scan, so the JSON parser
  prunes to the requested fields (Spark pushes the needed-field set into
  ``JacksonParser`` — unreferenced JSON keys are never materialized).
* **Malformed lines are data, not exceptions.** A trillion-line corpus
  WILL contain garbage; the default ``PERMISSIVE`` mode keeps bad lines
  as a ``_corrupt_record`` column so they can be counted/quarantined in
  the same pass (``read_jsonl_with_quarantine``). ``FAILFAST`` is for
  checkpointed re-ingest where corruption means upstream breakage.
* JSONL is a line format: gzip-compressed files are NOT splittable (one
  task per file); at scale prefer uncompressed/zstd-seekable or many
  medium files. The writer defaults to no compression for that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Schema-enforced JSONL scan (one object per line).

    ``mode``: PERMISSIVE (default) nulls unparseable fields,
    DROPMALFORMED drops bad lines, FAILFAST raises on the first one.
    """
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .option("lineSep", "\n")
        .json(path)
    )


def read_jsonl_with_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE scan that splits good rows from quarantined raw lines.

    Returns ``(good, quarantine)`` — both lazy projections of ONE text
    scan: ``spark.read.text`` + ``from_json``, NOT the JSON reader. The
    reader's corrupt column comes with the
    ``QUERY_ONLY_CORRUPT_RECORD_COLUMN`` restriction (any query whose
    column pruning leaves only the corrupt column — e.g. a bare
    ``count()`` after the null-filter — is disallowed); parsing
    explicitly keeps both branches unrestricted and retains the
    verbatim line at zero extra cost.

    Quarantine rows keep the declared fields (PERMISSIVE half-parses a
    type-mismatch line: only the offending field is null) plus
    ``raw_line``, the replayable original.
    """
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.text(path)
        .filter(F.trim("value") != "")  # the JSON reader skips blank lines too
        .select(
            F.col("value").alias("raw_line"),
            F.from_json(
                "value",
                with_corrupt,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("rec"),
        )
    )
    bad = F.col(f"rec.{CORRUPT_COL}").isNotNull()
    good = parsed.filter(~bad).select("rec.*").drop(CORRUPT_COL)
    quarantine = parsed.filter(bad).select(
        *[F.col(f"rec.{f.name}") for f in schema.fields], "raw_line"
    )
    return good, quarantine


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "error",
    compression: str | None = None,
) -> None:
    """Write a DataFrame as JSONL (one object per line, null fields
    omitted per JSON-lines convention — ``ignoreNullFields`` default).

    Distributed multi-file write — never ``coalesce(1)``; downstream
    readers take the directory. Compression is opt-in (see module note
    on splittability)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
