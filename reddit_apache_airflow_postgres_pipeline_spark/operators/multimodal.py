"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension (BASELINE.json): a 100 TB training-data pipeline
carries image/audio/video as ``BinaryType`` columns with a typed metadata
struct, processed by Arrow-batched ``mapInPandas`` stages. The reference
has no media path (SURVEY.md §1.2 — no binary types), so this module is
engine-new; its contract is the Spark-side plumbing — schema, partition
flow, UDF signatures, batch shapes — with the codec boundary isolated
behind one function.

Codec policy: real decoders (PIL / soundfile / av) are NOT in this
container. ``_decode_real`` gates them behind import-try and raises
``NotImplementedError`` when absent; every shipped transform instead
uses the DETERMINISTIC FAKE codec — payload bytes ARE the sample grid
(uint8) — so tests exercise the full distributed path with exact
expected values. Swapping in a real codec changes only the per-batch
numpy call, not the plan shape.

Scale notes: every transform below is map-only (no shuffle) — media rows
flow through ``mapInPandas`` partition-by-partition with Arrow transfer,
so a 1000-executor cluster scales linearly in bytes. ``sample_frames``
explodes rows but stays within the partition. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` (payloads are MBs —
set it low, e.g. 64, for real media).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

KINDS = ["image", "audio", "video"]
FMTS = {"image": "fake-raw8", "audio": "fake-pcm8", "video": "fake-rawv8"}


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table from ``documents``: the UTF-8
    bytes of ``text`` are the payload; metadata derives from ``doc_id``.
    Pure column expressions (JVM-side), reproducible in ANSI SQL — this is
    the fixture generator for the multimodal path AND an oracle-checkable
    query in its own right."""
    kind = F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.coalesce("text", F.lit("")), "UTF-8").alias("payload"),
        F.struct(
            (F.lit(16) + F.col("doc_id") % 48).cast("int").alias("width"),
            (F.lit(16) + F.col("doc_id") % 32).cast("int").alias("height"),
            (F.lit(8000) + (F.col("doc_id") % 8) * 1000).cast("int").alias("sample_rate"),
            (F.lit(1) + F.col("doc_id") % 16).cast("int").alias("n_frames"),
            kind.alias("fmt"),
        ).alias("meta"),
    )


def _decode_real(kind: str, payload: bytes, meta: dict):
    """Real-codec boundary: returns the decoded uint8 sample vector.

    Images decode through Pillow when it is importable (any PIL-readable
    container format → grayscale uint8 pixels), so deployments that add
    Pillow get a real image path with zero plan changes — the swap is
    exactly the per-batch numpy call, as the module docstring promises.
    Audio/video stay gated: their codec libs (soundfile / av) are not in
    any supported container yet."""
    import numpy as np

    if kind == "image":
        try:
            import PIL.Image
        except ImportError as e:
            raise NotImplementedError(
                f"real image decode needs Pillow: {e}"
            ) from e
        import io

        with PIL.Image.open(io.BytesIO(payload or b"")) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8).ravel()
    try:
        if kind == "audio":
            import soundfile  # noqa: F401
        else:
            import av  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            f"real {kind} decode needs an external codec library: {e}"
        ) from e
    raise NotImplementedError("real codec wiring is environment-specific")


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
    ]
)


def decode_stats(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode each payload and emit per-media sample statistics.
    ``mapInPandas``: one Arrow batch in, one pandas frame out;
    numpy-vectorized inside the batch.

    ``codec="fake"`` (default, always available): payload bytes ARE the
    uint8 sample grid. ``codec="real"`` routes through
    :func:`_decode_real` — currently Pillow-backed for images, raising
    ``NotImplementedError`` where the codec lib is absent. Either way
    the plan is the same single map stage."""
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if codec == "real":
                arrs = [
                    _decode_real(k, p, m)
                    for k, p, m in zip(pdf["kind"], pdf["payload"], pdf["meta"])
                ]
            else:
                arrs = [np.frombuffer(p or b"", dtype=np.uint8) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [int(a.size) for a in arrs],
                    "byte_mean": [float(a.mean()) if a.size else 0.0 for a in arrs],
                    "byte_min": [int(a.min()) if a.size else 0 for a in arrs],
                    "byte_max": [int(a.max()) if a.size else 0 for a in arrs],
                }
            )

    return media.mapInPandas(_batches, DECODE_STATS_SCHEMA)


def resize_image(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize on the fake codec's byte grid: payload is
    row-major ``meta.height × meta.width`` uint8 (truncated / zero-padded
    to fit), output is ``out_h × out_w``. Schema-preserving map stage —
    composable with further media transforms."""
    import numpy as np

    def _one(payload: bytes, w: int, h: int) -> bytes:
        grid = np.zeros(h * w, dtype=np.uint8)
        src = np.frombuffer(payload or b"", dtype=np.uint8)[: h * w]
        grid[: src.size] = src
        grid = grid.reshape(h, w)
        yi = (np.arange(out_h) * h) // out_h
        xi = (np.arange(out_w) * w) // out_w
        return grid[np.ix_(yi, xi)].tobytes()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [
                _one(p, m["width"], m["height"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            out["meta"] = [
                {**m, "width": out_w, "height": out_h} for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(_batches, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling: the fake codec splits the payload into
    ``meta.n_frames`` equal chunks (tail bytes dropped); keep frames
    ``0, k, 2k, …``. Row-exploding map stage — output row count grows but
    no shuffle is introduced."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                n = max(int(meta["n_frames"]), 1)
                payload = payload or b""
                flen = len(payload) // n
                for i in range(0, n, every_k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * flen : (i + 1) * flen])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(_batches, FRAME_SCHEMA)


def payload_fingerprint(col: Column | str) -> Column:
    """64-bit content fingerprint of a binary payload (xxhash64) — exact
    dedup key for media, JVM-side."""
    return F.xxhash64(F.col(col) if isinstance(col, str) else col)


FEATURES_SCHEMA = "media_id long, kind string, feat array<double>"


def byte_histogram_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Feature-extract each media payload into a 16-dim embedding: the
    normalized high-nibble byte histogram — the stand-in for a real
    encoder (CLIP/wav2vec) with the identical Spark plumbing: one
    Arrow-batched ``mapInPandas`` stage producing an ``array<double>``
    column that flows straight into the similarity operators
    (knn_bruteforce / IVF / SRP-LSH all take any id+vector relation).
    ``codec`` dispatches exactly like :func:`decode_stats`: the default
    fake codec histograms the raw payload bytes; ``codec="real"``
    decodes first (raising where the codec lib is absent).

    Bin fractions are IEEE divisions of exact integer counts — no
    rounding here, so the SQL oracle reproduces the vectors bit-for-bit
    (the same raw-double discipline as decode_stats' byte_mean).
    Zero-byte payloads yield the zero vector; ANN callers should filter
    them out (cosine is undefined) — the registry query does.
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if codec == "real":
                # same dispatch contract as decode_stats: real decode
                # first (Pillow-backed for images, NotImplementedError
                # where the codec lib is absent), histogram the decoded
                # samples quantized back to uint8
                arrs = [
                    np.asarray(
                        _decode_real(k, p, m), dtype=np.uint8
                    ).ravel()
                    for k, p, m in zip(
                        pdf["kind"], pdf["payload"], pdf["meta"]
                    )
                ]
            else:
                arrs = [
                    np.frombuffer(p or b"", dtype=np.uint8)
                    for p in pdf["payload"]
                ]
            feats = [
                [0.0] * 16
                if a.size == 0
                else (np.bincount(a >> 4, minlength=16) / a.size).tolist()
                for a in arrs
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                }
            )

    return media.mapInPandas(_batches, FEATURES_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("sig", T.LongType()),
    ]
)


def ahash_signatures(
    media: DataFrame, n: int = 60, codec: str = "fake"
) -> DataFrame:
    """Perceptual average-hash of each media payload: the first ``n``
    decoded samples (zero-padded when shorter) threshold against their
    own mean into an ``n``-bit packed-long signature — the classic
    aHash image near-dup key, here over the codec boundary exactly like
    :func:`byte_histogram_features` (fake codec: payload bytes ARE the
    samples; ``codec="real"`` decodes first). ``n`` ≤ 60 keeps the
    packed signature positive in a signed BIGINT for both engines
    (the HLL 60-bit convention). Bit i (MSB-first) is 1 iff
    sample_i > mean — the mean is a float division of an exact integer
    sum, so the SQL oracle replays every bit.

    Feed the output to neardup.signature_near_dups for banded
    Hamming-distance pairs: near-duplicate IMAGES at corpus scale with
    the same pigeonhole plan SimHash text dedup uses — never quadratic.
    """
    if not 1 <= n <= 60:
        raise ValueError(f"n must be in [1, 60], got {n}")
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if codec == "real":
                arrs = [
                    np.asarray(_decode_real(k, p, m), dtype=np.uint8).ravel()
                    for k, p, m in zip(pdf["kind"], pdf["payload"], pdf["meta"])
                ]
            else:
                arrs = [
                    np.frombuffer(p or b"", dtype=np.uint8)
                    for p in pdf["payload"]
                ]
            # whole-batch vectorization (guide §4.2): one (rows, n)
            # int64 matrix, row means, threshold, dot with the MSB-first
            # power vector — no per-row/per-bit Python loop. Bit i is 1
            # iff sample_i > mean, identical comparisons to the old
            # loop; the dot is exact in int64 (n <= 60 keeps every
            # power and the packed sum inside the signed range).
            if arrs:
                mat = np.zeros((len(arrs), n), dtype=np.int64)
                for r, a in enumerate(arrs):
                    k = min(n, a.size)
                    mat[r, :k] = a[:k]
                means = mat.sum(axis=1) / float(n)
                bits = mat > means[:, None]
                powers = np.left_shift(
                    np.int64(1), np.arange(n - 1, -1, -1, dtype=np.int64)
                )
                sigs = (bits * powers).sum(axis=1).tolist()
            else:
                sigs = []
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "sig": pd.Series(sigs, dtype="int64"),
                }
            )

    return media.mapInPandas(_batches, AHASH_SCHEMA)
