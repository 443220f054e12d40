"""Document chunking for retrieval / embedding pipelines.

A 100 TB corpus is embedded and indexed chunk-wise, not doc-wise: the
chunker is the map stage that fans each document into fixed-size
overlapping token windows carrying enough metadata (doc id, chunk
index, token span) to reassemble provenance later. Everything here is
pure Column expressions over a single scan — no shuffle, no Python; at
scale the operator is embarrassingly parallel and its output feeds
straight into the embedding ``mapInPandas`` stage
(operators/multimodal.py shows that pattern).

Window rule (replayable in ANSI SQL, see plans/registry_curation.py):
tokens are the whitespace-split of the trimmed text; with window size
``chunk_tokens`` and ``overlap`` tokens of context carried between
neighbours, stride = chunk_tokens − overlap and

    n_chunks = ceil(max(n_tokens − overlap, 1) / stride)

so every chunk except the last contributes exactly ``stride`` new
tokens, the final chunk is never a pure suffix of its predecessor, and
a doc shorter than one window still yields exactly one chunk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sliding_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(doc_id, chunk_idx, start_token, n_tokens, chunk_text): overlapping
    token windows per document.

    ``start_token`` is the 0-based token offset of the window;
    ``n_tokens`` is the actual window length (< chunk_tokens only for
    the final window). Docs whose text is empty/whitespace produce no
    rows. Case is preserved — chunks feed embedders, not dedup hashes.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.size(toks)
    n_chunks = F.ceil(
        F.greatest(n - F.lit(overlap), F.lit(1)) / F.lit(float(stride))
    ).cast("int")

    def window(i: Column) -> Column:
        return F.struct(
            i.cast("int").alias("chunk_idx"),
            (i * stride).cast("int").alias("start_token"),
            F.least(F.lit(chunk_tokens), n - i * stride)
            .cast("int")
            .alias("n_tokens"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
        )

    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.transform(F.sequence(F.lit(0), n_chunks - 1), window)
            ).alias("c"),
        )
        .select("doc_id", "c.*")
        .filter(F.col("chunk_text") != "")
    )
