"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the *decode* kernels are stubs —
but all Spark-side plumbing is real and tested: binary columns, typed
metadata structs, Arrow-batched ``mapInPandas`` with explicit output schemas,
and partition-count control so 100 TB of blobs stream through fixed-size
Arrow batches instead of materializing per-executor.

Swap ``_decode_image_stub`` for a real PIL/libvips call and nothing else
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("meta", T.StructType(
            [
                T.StructField("n_bytes", T.LongType(), True),
                T.StructField("content_hash", T.StringType(), True),
            ]
        ), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Wrap any column as an opaque binary media column with typed metadata.

    For real pipelines ``payload_col`` is already binary (e.g. from
    ``spark.read.format('binaryFile')``); for tests we encode text. Metadata
    (size, content hash) is computed with built-ins — no decode needed.
    """
    payload = F.col(payload_col)
    content = payload if dict(df.dtypes)[payload_col] == "binary" else F.encode(payload, "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.lit("image").alias("media_type"),
        F.struct(
            F.length(content).cast("long").alias("n_bytes"),
            F.md5(content).alias("content_hash"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decode: derives (width, height, channels, mean_luma)
    from the byte content. Replace with a real codec in production —
    the Spark plumbing (schema, batching, partitioning) is identical.
    """
    n = len(payload)
    width = 64 + (n % 64)
    height = 64 + ((n // 64) % 64)
    checksum = sum(payload[:256]) if n else 0
    return width, height, 3, float(checksum % 256)


def decode_image_features(media: DataFrame, batch_partitions: int | None = None) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary media rows.

    ``mapInPandas`` keeps the blobs inside executor-side Arrow batches (never
    collected); ``batch_partitions`` controls task granularity for huge blob
    tables (repartition before the map so each task holds a bounded byte
    volume).
    """
    import pandas as pd  # noqa: PLC0415

    df = media.select("media_id", "content")
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [_decode_image_stub(bytes(b or b"")) for b in pdf["content"]]
            out = pd.DataFrame(feats, columns=["width", "height", "n_channels", "mean_luma"])
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("src_bytes", T.LongType(), True),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("resized_hash", T.StringType(), True),
    ]
)


def resize_media(
    media: DataFrame, target_bytes: int = 1024, batch_partitions: int | None = None
) -> DataFrame:
    """Resize plumbing: downsample every blob to exactly ``target_bytes``
    bytes by nearest-neighbor sampling of the byte stream (output byte i =
    input byte (i·n)//target — integer math, engine-portable). The kernel is
    the codec-free stand-in for a real image resize: swap the inner loop for
    PIL/libvips ``resize`` and the Arrow plumbing (explicit schema, bounded
    batches, partition-count control) is unchanged.

    ``resized_hash`` is md5 over the LOWERCASE HEX of the resized bytes (not
    the raw bytes) so any engine — including the DuckDB oracle — can
    recompute it from string builtins. Empty payloads resize to empty.
    """
    import hashlib  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    df = media.select("media_id", "content")
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            srcs, outs, hashes = [], [], []
            for b in pdf["content"]:
                payload = bytes(b or b"")
                n = len(payload)
                out = (
                    bytes(payload[(i * n) // target_bytes] for i in range(target_bytes))
                    if n
                    else b""
                )
                srcs.append(n)
                outs.append(out)
                hashes.append(hashlib.md5(out.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "src_bytes": srcs,
                    "resized": outs,
                    "resized_hash": hashes,
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def media_chunks(media: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """Split each blob into fixed-size chunks entirely JVM-side — the
    shuffle-free pre-step for chunked hashing / upload / dedup of large media:
    ``sequence`` of offsets + ``explode`` + binary ``substring``; no Python
    ever touches the bytes. Emits the chunk's size and lowercase hex so
    downstream (and the DuckDB oracle) can verify content without an opaque
    binary column.
    """
    n = F.col("meta.n_bytes")
    off = F.col("__off")
    chunk = F.expr(f"substring(content, __off + 1, {chunk_bytes})")
    return (
        media.filter(n > 0)
        .select(
            "media_id",
            "content",
            F.explode(
                F.sequence(F.lit(0), n - 1, F.lit(chunk_bytes))
            ).alias("__off"),
        )
        .select(
            "media_id",
            (off / chunk_bytes).cast("long").alias("chunk_id"),
            F.length(chunk).cast("long").alias("chunk_bytes"),
            F.lower(F.hex(chunk)).alias("chunk_hex"),
        )
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing demo: one output row per sampled offset of
    each blob (video → frames analogue). Pure built-ins: sequence + explode;
    the decode of each frame would be a mapInPandas like above."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_bytes") - 1, F.lit(0)),
                F.lit(every_n_bytes),
            )
        ).alias("frame_offset"),
    )


MEDIA_EMBED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
    ]
)


def _encode_stub(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake encoder: ``dim`` doubles in [0,1) derived from md5
    of the content hex — an honest stand-in for a real image/audio encoder
    (swap in a CLIP/wav2vec call; schema, batching, and everything downstream
    are unchanged). Deliberately md5-based so an external engine can replay
    it and verify the full binary→embedding→dedup path end-to-end.
    """
    import hashlib  # noqa: PLC0415

    hx = payload.hex()
    return [
        int(hashlib.md5(f"{hx}_{i}".encode()).hexdigest()[:8], 16) / 4294967296.0
        for i in range(dim)
    ]


def media_embeddings(
    media: DataFrame, dim: int = 8, batch_partitions: int | None = None
) -> DataFrame:
    """Arrow-batched content→embedding extraction over binary media rows:
    (media_id, embedding array<double>).

    The encoder runs inside ``mapInPandas`` — the one place Python belongs
    (opaque-binary decode); blobs stream through executor-side Arrow batches
    and never hit the driver. ``batch_partitions`` bounds per-task byte
    volume for large blob tables. Downstream similarity/dedup stays JVM-side.
    """
    import pandas as pd  # noqa: PLC0415

    df = media.select("media_id", "content")
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "embedding": [
                        _encode_stub(bytes(b or b""), dim) for b in pdf["content"]
                    ],
                }
            )

    return df.mapInPandas(run, MEDIA_EMBED_SCHEMA)
