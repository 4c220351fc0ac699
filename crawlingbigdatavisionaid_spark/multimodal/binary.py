"""Multimodal columns (OP-X-MM-01): opaque ``binary`` payloads + typed
metadata, with decode / feature-extraction / frame-sampling plumbing.

Design: media is an opaque ``BinaryType`` column next to a metadata
struct (mime, byte length, checksum). Heavy per-item work (decode,
resize, feature extraction) crosses to Python ONCE per Arrow batch via
``mapInPandas`` — the schema, partitioning, UDF signature and batch
shapes here are the real 100 TB plumbing. :func:`decode_image` is a
REAL decoder for the uncompressed binary PNM family (P5 grayscale /
P6 RGB) — header parse + raw pixel array, no external library; formats
that require codec libraries (JPEG/PNG) raise ``ValueError`` and flow
through the same per-item error-isolation path as any corrupt payload.

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


def decode_image(payload: bytes) -> dict:
    """Decode an uncompressed binary PNM image (P5 grayscale, P6 RGB)
    with no external library: whitespace/comment-tolerant header parse
    (magic, width, height, maxval) followed by the raw 8-bit pixel
    array. Returns exact integer statistics; raises ``ValueError`` for
    anything that is not a well-formed 8-bit binary PNM (including
    codec formats like JPEG/PNG, which need libraries this environment
    lacks)."""
    if payload[:1] != b"P" or payload[1:2] not in (b"5", b"6"):
        raise ValueError("not a binary PNM payload")
    channels = 3 if payload[1:2] == b"6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end-of-line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PNM header")
        try:
            fields.append(int(payload[start:pos]))
        except ValueError as e:
            raise ValueError(f"bad PNM header token {payload[start:pos]!r}") from e
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        raise ValueError("non-positive PNM dimensions")
    if not 0 < maxval < 256:
        raise ValueError("only 8-bit PNM supported")
    pos += 1  # exactly one whitespace byte separates maxval from pixels
    n = width * height * channels
    pixels = payload[pos : pos + n]
    if len(pixels) != n:
        raise ValueError("pixel array truncated")
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "n_pixels": width * height,
        # channel-interleaved layout: channel c is every channels-th byte
        "channel_sums": [sum(pixels[c::channels]) for c in range(channels)],
    }


def attach_ppm(docs: DataFrame) -> DataFrame:
    """documents + a VALID binary P6 (RGB) PPM payload per doc, built
    with JVM-side expressions: dimensions derived from doc_id, pixel
    bytes from the (ASCII) text rpad-ed/truncated to exactly
    width*height*3 — so :func:`decode_image` exercises a real image
    format end-to-end and DuckDB can recompute every decoded statistic
    from the same arithmetic."""
    return docs.select(
        "doc_id",
        F.encode(
            F.expr(
                "concat('P6\n', cast(4 + doc_id % 5 as string), ' ', "
                "cast(3 + doc_id % 4 as string), '\n255\n', "
                "rpad(coalesce(text, ''), "
                "cast((4 + doc_id % 5) * (3 + doc_id % 4) * 3 as int), 'x'))"
            ),
            "UTF-8",
        ).alias("payload"),
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def decode_image_features(with_payload: DataFrame) -> DataFrame:
    """Real image decode over the binary column: one Arrow batch ->
    :func:`decode_image` per payload -> exact integer statistics.
    Undecodable payloads are dropped, not fatal (OP-STR-02's per-item
    error isolation, applied to media)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_image(bytes(payload))
                except ValueError:
                    continue
                s = d["channel_sums"]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "n_pixels": d["n_pixels"],
                        "sum_r": s[0],
                        "sum_g": s[1] if d["channels"] == 3 else None,
                        "sum_b": s[2] if d["channels"] == 3 else None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DECODE_SCHEMA.fields]
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        batches, _DECODE_SCHEMA
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
