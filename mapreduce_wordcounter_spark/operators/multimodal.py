"""Multimodal-column plumbing (north-star extension, BASELINE.json).

Treats media payloads as opaque ``binary`` columns with typed metadata,
processed by Arrow-batched Pandas UDFs over ``mapInPandas`` — the
pattern a 100 TB image/audio pipeline uses (decode/resize/frame-sample
per batch, never per row, never on the driver).

The container has no image/audio codecs, so the *decode* step is
stubbed (``decode_image`` raises NotImplementedError unless a codec
import succeeds — see tests/test_multimodal.py), while everything
Spark-side — schema, binary handling, UDF signature, Arrow batch shape,
partitioning — is real and oracle-checked: the synthetic payload is the
utf-8 encoding of ``documents.text``, so byte-level features computed
in the Pandas UDF have exact SQL equivalents over character codes
(the corpus is ASCII, so byte == char code).

Scale posture: binary columns ride normal parquet row groups;
``maxPartitionBytes`` keeps scan partitions bounded no matter how big
individual payloads are, and mapInPandas streams Arrow batches so
executor memory holds one batch of payloads, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_wordcounter_spark.registry import query
from mapreduce_wordcounter_spark.tables import load_table


def attach_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthetic media column: (doc_id, content: binary,
    media_type, n_chars). In production `content` is the image/audio
    payload read from object storage."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("content"),
        F.lit("text/plain;fake-media").alias("media_type"),
        "n_chars",
    )


@query(
    "mm_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS content_sha256
    FROM documents
    """,
)
def mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary column: size + content digest —
    pure JVM expressions, no Python in the hot path."""
    b = attach_binary(spark, sf_dir)
    return b.select(
        "doc_id",
        F.length("content").alias("n_bytes"),
        F.sha2("content", 256).alias("content_sha256"),
    )


_FEATURES_SCHEMA = "doc_id long, n_bytes long, byte_sum long, max_byte int"


@query(
    "mm_features_pandas",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           list_reduce(list_prepend(0::BIGINT,
               list_transform(generate_series(1, length(text)),
                              i -> ascii(substr(text, i, 1))::BIGINT)),
               (acc, c) -> acc + c) AS byte_sum,
           -- COALESCE pins the zero-length-payload convention to the
           -- extractor's (max of empty = 0, like byte_sum): list_max
           -- over an empty list is NULL, and the corpus having no
           -- empty docs today must not be what keeps the two sides
           -- agreeing.
           CAST(COALESCE(list_max(list_transform(generate_series(1, length(text)),
                              i -> ascii(substr(text, i, 1)))), 0) AS INT) AS max_byte
    FROM documents
    """,
)
def mm_features_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path end-to-end: binary payloads stream
    through an Arrow-batched Python UDF that emits fixed-width features.
    Oracle-checked because the fake features are byte-exact SQL over the
    ASCII payload — proving the plumbing, not just running it.

    The UDF body is nested so cloudpickle serializes it BY VALUE:
    Spark's Python workers do not share the driver's sys.path, so a
    module-level function reference would fail to unpickle there
    (ModuleNotFoundError) when this package is loaded via a path hack
    rather than installed. Rule for every Python UDF in this repo."""

    def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            arrs = [np.frombuffer(c, dtype=np.uint8) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [int(a.size) for a in arrs],
                    "byte_sum": [int(a.sum()) for a in arrs],
                    "max_byte": [int(a.max()) if a.size else 0 for a in arrs],
                }
            )

    b = attach_binary(spark, sf_dir).select("doc_id", "content")
    return b.mapInPandas(extract_features, schema=_FEATURES_SCHEMA)


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           j AS frame_no,
           1 + 256 * j AS byte_offset,
           md5(substring(text, 1 + 256 * j, 64)) AS frame_digest
    FROM documents,
         LATERAL (SELECT unnest(generate_series(0, (length(text) - 1) // 256)) AS j) f
    WHERE length(text) > 0
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a media payload: every 256th byte offset
    yields one 64-byte "frame" (stand-in for video frame extraction —
    no codecs in this container), digested per frame. Exercises the
    1→N mapInPandas shape: one input row fans out to a variable number
    of output rows inside the Arrow batch, which is exactly how a real
    frame sampler emits. Oracle: byte slices == char slices on the
    ASCII corpus."""
    import hashlib

    b = attach_binary(spark, sf_dir).select("doc_id", "content")

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained (pickled by value — workers lack this package).
        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "byte_offset": [], "frame_digest": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                data = bytes(content)
                if not data:
                    continue
                for j in range(0, (len(data) - 1) // 256 + 1):
                    frame = data[256 * j : 256 * j + 64]
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(j)
                    out["byte_offset"].append(1 + 256 * j)
                    out["frame_digest"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return b.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_no long, byte_offset long, frame_digest string",
    )


def decode_image(content: bytes) -> "object":
    """Real decode step — stubbed: the runtime image libraries are not
    in this container. The Spark-side integration (binary column →
    mapInPandas batch → decoded array) is exercised by
    mm_features_pandas with the deterministic fake decoder above."""
    try:
        from PIL import Image  # noqa: F401  (absent in this container)
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires an image codec (PIL/opencv); not "
            "available in this environment — see mm_features_pandas for "
            "the exercised plumbing"
        ) from exc
    import io

    return Image.open(io.BytesIO(content))


def image_feature_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/feature extraction pipeline wired to the (stubbed) real
    decoder — raises NotImplementedError at execution time in this
    container; registered rows-only nowhere, tested in pytest."""
    b = attach_binary(spark, sf_dir).select("doc_id", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained (no module references — see mm_features_pandas).
        import io

        for pdf in batches:
            for c in pdf["content"]:
                try:
                    from PIL import Image
                except ImportError as exc:
                    raise NotImplementedError(
                        "image decode requires an image codec (PIL/opencv);"
                        " not available in this environment"
                    ) from exc
                Image.open(io.BytesIO(bytes(c)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "ok": True})

    return b.mapInPandas(run, schema="doc_id long, ok boolean")


@query(
    "mm_audio_windows",
    oracle="""
    SELECT doc_id,
           j AS window_no,
           1 + 256 * j AS sample_offset,
           CAST(length(substring(text, 1 + 256 * j, 512)) AS INT) AS n_samples,
           list_reduce(list_prepend(0::BIGINT,
               list_transform(generate_series(1 + 256 * j,
                                              least(length(text), 256 * j + 512)),
                              i -> ascii(substr(text, i, 1))::BIGINT)),
               (acc, c) -> acc + c) AS amp_sum,
           list_reduce(list_prepend(0::BIGINT,
               list_transform(generate_series(1 + 256 * j,
                                              least(length(text), 256 * j + 512)),
                              i -> (ascii(substr(text, i, 1))::BIGINT
                                    * ascii(substr(text, i, 1))::BIGINT))),
               (acc, c) -> acc + c) AS energy,
           CAST(list_max(
               list_transform(generate_series(1 + 256 * j,
                                              least(length(text), 256 * j + 512)),
                              i -> ascii(substr(text, i, 1)))) AS INT) AS peak
    FROM documents,
         LATERAL (SELECT unnest(generate_series(0, (length(text) - 1) // 256)) AS j) w
    WHERE length(text) > 0
    """,
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing stand-in: the payload is treated as a u8 PCM
    sample stream and cut into 512-sample windows with a 256-sample hop
    (50% overlap) — the framing every spectral/feature extractor (STFT,
    MFCC, VAD) starts from. Per-window features are integer (sum,
    energy = sum of squares, peak) so the DuckDB oracle is byte-exact;
    a real pipeline would replace the feature block with the codec +
    FFT call inside the same mapInPandas shape. 1→N fan-out happens
    inside the Arrow batch, never on the driver."""
    b = attach_binary(spark, sf_dir).select("doc_id", "content")

    def window_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained (pickled by value — workers lack this package).
        import numpy as np

        WIN, HOP = 512, 256
        for pdf in batches:
            out = {
                "doc_id": [],
                "window_no": [],
                "sample_offset": [],
                "n_samples": [],
                "amp_sum": [],
                "energy": [],
                "peak": [],
            }
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                a = np.frombuffer(bytes(content), dtype=np.uint8).astype(np.int64)
                if a.size == 0:
                    continue
                for j in range(0, (a.size - 1) // HOP + 1):
                    seg = a[HOP * j : HOP * j + WIN]
                    out["doc_id"].append(doc_id)
                    out["window_no"].append(j)
                    out["sample_offset"].append(1 + HOP * j)
                    out["n_samples"].append(int(seg.size))
                    out["amp_sum"].append(int(seg.sum()))
                    out["energy"].append(int((seg * seg).sum()))
                    out["peak"].append(int(seg.max()))
            yield pd.DataFrame(out)

    return b.mapInPandas(
        window_audio,
        schema=(
            "doc_id long, window_no long, sample_offset long, "
            "n_samples int, amp_sum long, energy long, peak int"
        ),
    )


@query(
    "mm_chunk_dedup",
    oracle="""
    SELECT chunk_digest,
           COUNT(*) AS n_copies,
           COUNT(DISTINCT doc_id) AS n_docs
    FROM (
        SELECT doc_id, md5(substring(text, 1 + 256 * j, 256)) AS chunk_digest
        FROM documents,
             LATERAL (SELECT unnest(generate_series(0, (length(text) - 1) // 256)) AS j) c
        WHERE length(text) > 0)
    GROUP BY chunk_digest
    HAVING COUNT(*) > 1
    """,
)
def mm_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-level chunk dedup over media payloads: cut each binary
    into fixed 256-byte chunks, digest each, and report digests stored
    more than once (the content-addressable-store dedup a blob lake
    runs — identical media shared across documents collapses to one
    physical chunk per digest). Fixed-size chunking is the baseline;
    content-defined (rolling-hash) boundaries are the shift-tolerant
    refinement and share this exact plan shape with a different
    boundary rule.

    Scale: per-row fan-out (1→N inside the scan projection) → one
    map-combined groupBy on the digest — the same single-shuffle
    profile as exact document dedup, at chunk granularity. Oracle:
    byte slices == char slices on the ASCII corpus."""
    b = attach_binary(spark, sf_dir).select("doc_id", "content")
    chunks = b.filter(F.length("content") > 0).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, cast((length(content) - 1) / 256 as int)),"
                " j -> md5(substring(content, 1 + 256 * j, 256)))"
            )
        ).alias("chunk_digest"),
    )
    return (
        chunks.groupBy("chunk_digest")
        .agg(
            F.count("*").alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_copies") > 1)
    )


@query(
    "mm_image_resize",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(len(list_transform(generate_series(1, least(length(text), 1024), 4),
                                   i -> ascii(substr(text, i, 1)))) AS INT) AS resized_len,
           list_reduce(list_prepend(0::BIGINT,
               list_transform(generate_series(1, least(length(text), 1024), 4),
                              i -> ascii(substr(text, i, 1))::BIGINT)),
               (acc, c) -> acc + c) AS resized_sum
    FROM documents
    WHERE length(text) > 0
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize step of the image pipeline as Arrow-batched plumbing:
    crop the payload to its first 1024 bytes and 4× downsample by
    striding — the real pipeline swaps the stride for the codec's
    resample kernel inside the SAME mapInPandas shape (batch in, one
    fixed-width feature row out). Summary features (length + checksum of
    the resized payload) keep the oracle exact over the ASCII corpus.

    Scale: map-only Arrow stage, no shuffle; memory holds one batch of
    cropped payloads, never a partition."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Self-contained (pickled by value — workers lack this package).
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "resized_len": [], "resized_sum": []}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                data = np.frombuffer(bytes(content), dtype=np.uint8)
                if data.size == 0:
                    continue
                small = data[:1024][::4].astype(np.int64)
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(int(data.size))
                out["resized_len"].append(int(small.size))
                out["resized_sum"].append(int(small.sum()))
            yield pd.DataFrame(out)

    b = attach_binary(spark, sf_dir).select("doc_id", "content")
    return b.mapInPandas(
        resize,
        schema="doc_id long, n_bytes long, resized_len int, resized_sum long",
    )


@query(
    "mm_features_arrow",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           list_reduce(list_prepend(0::BIGINT,
               list_transform(generate_series(1, length(text)),
                              i -> ascii(substr(text, i, 1))::BIGINT)),
               (acc, c) -> acc + c) AS byte_sum,
           -- COALESCE: empty payload → 0, matching the extractor (see
           -- mm_features_pandas).
           CAST(COALESCE(list_max(list_transform(generate_series(1, length(text)),
                              i -> ascii(substr(text, i, 1)))), 0) AS INT) AS max_byte
    FROM documents
    """,
)
def mm_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm_features_pandas' twin on ``mapInArrow`` — the third Python
    execution mode (row-Python < Arrow-pandas < raw Arrow): batches
    arrive as pyarrow RecordBatches with NO pandas materialization, the
    right tier for payloads where even a pandas Series wrapper per cell
    is waste (large binary blobs, zero-copy slicing into decoders).
    Same oracle as the pandas twin, so the two execution modes are
    pinned to identical results.

    Scale: identical to mapInPandas — one map-only Arrow stage,
    executor memory bounded by the Arrow batch, not the partition."""

    def extract(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            doc_id = rb.column(rb.schema.get_field_index("doc_id"))
            contents = rb.column(rb.schema.get_field_index("content"))
            arrs = [
                np.frombuffer(c.as_py(), dtype=np.uint8) for c in contents
            ]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": doc_id,
                    "n_bytes": pa.array(
                        [int(a.size) for a in arrs], type=pa.int64()
                    ),
                    "byte_sum": pa.array(
                        [int(a.sum()) for a in arrs], type=pa.int64()
                    ),
                    "max_byte": pa.array(
                        [int(a.max()) if a.size else 0 for a in arrs],
                        type=pa.int32(),
                    ),
                }
            )

    b = attach_binary(spark, sf_dir).select("doc_id", "content")
    return b.mapInArrow(extract, schema=_FEATURES_SCHEMA)
