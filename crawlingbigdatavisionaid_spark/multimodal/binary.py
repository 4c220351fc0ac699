"""Multimodal columns (OP-X-MM-01): opaque ``binary`` payloads + typed
metadata, with decode / feature-extraction / frame-sampling plumbing.

Design: media is an opaque ``BinaryType`` column next to a metadata
struct (mime, byte length, checksum). Heavy per-item work (decode,
resize, feature extraction) crosses to Python ONCE per Arrow batch via
``mapInPandas`` — the schema, partitioning, UDF signature and batch
shapes here are the real 100 TB plumbing. The actual image/audio decode
is STUBBED (:func:`decode_image` raises ``NotImplementedError``) because
no media libraries exist in this environment; a deterministic
byte-level "fake decode" exercises the full path end-to-end.

At scale the same pattern reads real media with
``spark.read.format('binaryFile')`` (path, modificationTime, length,
content) partitioned by directory; here the payload is synthesized from
``documents.text`` so results are oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FRAME_BYTES = 16  # simulated "video frame" width for frame sampling
FRAME_STRIDE = 4  # sample every 4th frame


def decode_image(payload: bytes) -> "object":
    """Real media decode — NOT IMPLEMENTED in this environment.

    Requires an image library (PIL/opencv) that is not installed here.
    The Spark-side plumbing (binary column -> mapInPandas -> feature
    struct) is identical for the real and fake paths.
    """
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; use fake_decode_features() for the plumbing path"
    )


def attach_binary(docs: DataFrame) -> DataFrame:
    """documents + (payload binary, meta struct) — engine-side encode."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.crc32(payload).alias("checksum"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sum_bytes", LongType()),
        StructField("min_byte", IntegerType()),
        StructField("max_byte", IntegerType()),
    ]
)


def fake_decode_features(with_payload: DataFrame) -> DataFrame:
    """Deterministic byte-level "decode": per-item integer features.

    The stand-in for image feature extraction — same Arrow-batched
    mapInPandas shape a real model/decoder would use. Integer outputs
    keep it engine-exact for the DuckDB oracle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "sum_bytes": pdf["payload"].map(
                    lambda b: int(sum(b)) if len(b) else 0
                ),
                "min_byte": pdf["payload"].map(
                    lambda b: int(min(b)) if len(b) else -1
                ),
                "max_byte": pdf["payload"].map(
                    lambda b: int(max(b)) if len(b) else -1
                ),
            }
            yield pd.DataFrame(out)

    return with_payload.select("doc_id", "payload").mapInPandas(
        batches, _FEATURE_SCHEMA
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sum", LongType()),
    ]
)


def sample_frames(with_payload: DataFrame) -> DataFrame:
    """Simulated video frame sampling: split the payload into
    FRAME_BYTES-wide frames, keep every FRAME_STRIDE-th, emit an exact
    integer digest per kept frame. 1-row -> N-rows via mapInPandas."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    frame = payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(int(sum(frame)))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_sum": sums}
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        batches, _FRAME_SCHEMA
    )


RESIZE_STRIDE = 4  # keep every 4th byte — nearest-neighbor on a 1D stream

_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("resized_bytes", LongType()),
        StructField("resized_sum", LongType()),
    ]
)


def resize_payload(with_payload: DataFrame) -> DataFrame:
    """Binary -> binary "resize": nearest-neighbor downsample of the
    payload byte stream (every RESIZE_STRIDE-th byte) — the structural
    stand-in for image resize (a real one decodes, interpolates pixels,
    re-encodes inside the same mapInPandas batch loop). Emits the
    resized payload's exact integer digest + both lengths so the
    transform is value-checkable without shipping binaries through the
    compare."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, orig, rlen, rsum = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                small = payload[::RESIZE_STRIDE]
                ids.append(doc_id)
                orig.append(len(payload))
                rlen.append(len(small))
                rsum.append(int(sum(small)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "orig_bytes": orig,
                    "resized_bytes": rlen,
                    "resized_sum": rsum,
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        batches, _RESIZE_SCHEMA
    )
