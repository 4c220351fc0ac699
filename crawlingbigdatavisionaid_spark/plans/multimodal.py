"""Multimodal-column queries (OP-X-MM-01). The payload is synthesized
from ``documents.text`` (UTF-8 bytes of ASCII text), so every byte-level
feature has an exact SQL twin: octet/ascii arithmetic over the same text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..multimodal import binary as MM
from ..sources import load_table
from .registry import register


@register(
    "multimodal_metadata",
    ops=("OP-X-MM-01",),
    oracle="""
        SELECT doc_id,
               octet_length(encode(regexp_replace(text, '[^ -~]', 'x', 'g')))
                   AS n_bytes,
               'application/octet-stream' AS mime
        FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata struct, flattened for checking.
    (crc32 checksum exists in the struct but has no DuckDB twin, so the
    checked projection is n_bytes + mime.)"""
    docs = load_table(spark, sf_dir, "documents")
    wb = MM.attach_binary(docs)
    return wb.select(
        "doc_id",
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
    )


@register(
    "multimodal_decode_image",
    ops=("OP-X-MM-01",),
    # the oracle recomputes every DECODED statistic from the encode-side
    # arithmetic: dims from doc_id, channel sums over the rpad-ed ASCII
    # text laid out RGB-interleaved — so a pass proves the full
    # encode -> binary P6 PPM -> real header/pixel decode roundtrip
    oracle=f"""
        WITH px AS (
            SELECT doc_id,
                   CAST(4 + doc_id % 5 AS INTEGER) AS width,
                   CAST(3 + doc_id % 4 AS INTEGER) AS height,
                   list_transform(
                       string_split(rpad({MM.ASCII_TEXT_ORACLE},
                                         CAST((4 + doc_id % 5)
                                              * (3 + doc_id % 4) * 3 AS INTEGER),
                                         'x'), ''),
                       c -> CAST(ascii(c) AS BIGINT)) AS bytes
            FROM documents
        )
        SELECT doc_id, width, height, 3 AS channels,
               CAST(width * height AS BIGINT) AS n_pixels,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_filter(bytes, (x, i) -> (i - 1) % 3 = 0),
                                  x -> x)), (a, b) -> a + b) AS sum_r,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_filter(bytes, (x, i) -> (i - 1) % 3 = 1),
                                  x -> x)), (a, b) -> a + b) AS sum_g,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_filter(bytes, (x, i) -> (i - 1) % 3 = 2),
                                  x -> x)), (a, b) -> a + b) AS sum_b
        FROM px
    """,
)
def multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: every doc gets a valid binary P6
    PPM payload (JVM-side encode), then mapInPandas runs the
    dependency-free PNM decoder (header parse + pixel array) and emits
    exact per-channel statistics. No stubbed sub-path."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_image_features(MM.attach_ppm(docs))


@register(
    "multimodal_decode_audio",
    ops=("OP-X-MM-01",),
    # constant header (mono 8-bit PCM @8000 Hz, fixed 200-sample clip) +
    # samples from the ASCII text: the oracle recomputes every decoded
    # statistic, proving the RIFF-walk decode end-to-end
    oracle=f"""
        WITH s AS (
            SELECT doc_id,
                   list_transform(
                       string_split(rpad({MM.ASCII_TEXT_ORACLE},
                                         {MM.WAV_SAMPLES}, 'x'), ''),
                       c -> CAST(ascii(c) AS BIGINT)) AS samples
            FROM documents
        )
        SELECT doc_id, 1 AS channels, {MM.WAV_RATE} AS sample_rate,
               CAST({MM.WAV_SAMPLES} AS BIGINT) AS n_samples,
               list_reduce(list_prepend(CAST(0 AS BIGINT), samples),
                           (a, b) -> a + b) AS sum_samples,
               CAST(list_reduce(samples, (a, b) -> LEAST(a, b)) AS INTEGER)
                   AS min_sample,
               CAST(list_reduce(samples, (a, b) -> GREATEST(a, b)) AS INTEGER)
                   AS max_sample
        FROM s
    """,
)
def multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: every doc gets a valid mono 8-bit
    PCM WAV (constant RIFF header as a binary literal + ASCII samples),
    then mapInPandas runs the dependency-free RIFF/fmt/data chunk walk
    and emits exact sample statistics."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_audio_features(MM.attach_wav(docs))


@register(
    "multimodal_decode_video",
    ops=("OP-X-MM-01",),
    # all-ASCII YUV4MPEG2 stream (4x4 C444, 1 + doc_id % 4 frames) —
    # the oracle recomputes frame count and the Y-plane sum from the
    # same layout arithmetic the encoder used
    oracle=f"""
        WITH px AS (
            SELECT doc_id,
                   CAST(1 + doc_id % 4 AS INTEGER) AS n_frames,
                   list_transform(
                       string_split(rpad({MM.ASCII_TEXT_ORACLE},
                                         CAST((1 + doc_id % 4) * 48 AS INTEGER),
                                         'x'), ''),
                       c -> CAST(ascii(c) AS BIGINT)) AS bytes
            FROM documents
        )
        SELECT doc_id, 4 AS width, 4 AS height, n_frames,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_filter(bytes,
                                              (x, i) -> ((i - 1) % 48) < 16),
                                  x -> x)), (a, b) -> a + b) AS sum_luma
        FROM px
    """,
)
def multimodal_decode_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL (uncompressed) video decode end-to-end: every doc gets a
    valid YUV4MPEG2 stream with a doc-dependent frame count, then
    mapInPandas runs the dependency-free header/FRAME-walk decoder and
    emits geometry, frame count and the exact luma sum."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_video_features(MM.attach_y4m(docs))


@register(
    "multimodal_features",
    ops=("OP-X-MM-01",),
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   list_transform(
                       string_split(regexp_replace(text, '[^ -~]', 'x', 'g'),
                                    ''),
                       c -> ascii(c)) AS bytes
            FROM documents
        )
        SELECT doc_id,
               len(bytes) AS n_bytes,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(bytes, x -> CAST(x AS BIGINT))),
                           (a, b) -> a + b) AS sum_bytes,
               CAST(list_reduce(bytes, (a, b) -> LEAST(a, b)) AS INTEGER)
                   AS min_byte,
               CAST(list_reduce(bytes, (a, b) -> GREATEST(a, b)) AS INTEGER)
                   AS max_byte
        FROM b WHERE len(bytes) > 0
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas "decode" producing exact integer
    features — the real plumbing a media featurizer uses (text is ASCII,
    so UTF-8 bytes == ascii codes and DuckDB can mirror it)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") > 0
    )
    return MM.fake_decode_features(MM.attach_binary(docs))


@register(
    "multimodal_frame_sample",
    ops=("OP-X-MM-01",),
    oracle=f"""
        WITH b AS (
            SELECT doc_id,
                   regexp_replace(text, '[^ -~]', 'x', 'g') AS text,
                   octet_length(encode(regexp_replace(text, '[^ -~]', 'x', 'g')))
                       AS n
            FROM documents
        ), frames AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(0, CAST(n // {MM.FRAME_BYTES} AS BIGINT) - 1),
                       i -> i)) AS frame_idx,
                   text
            FROM b WHERE n >= {MM.FRAME_BYTES}
        )
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(
                       string_split(substring(text, frame_idx * {MM.FRAME_BYTES} + 1,
                                              {MM.FRAME_BYTES}), ''),
                       c -> CAST(ascii(c) AS BIGINT))),
                   (a, b) -> a + b) AS frame_sum
        FROM frames WHERE frame_idx % {MM.FRAME_STRIDE} = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulated video frame sampling (1 row -> N frames) through
    mapInPandas — row-expansion plumbing with an exact integer digest."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.sample_frames(MM.attach_binary(docs))


@register(
    "multimodal_resize",
    ops=("OP-X-MM-01",),
    oracle="""
        WITH b AS (
            SELECT doc_id,
                   list_transform(
                       string_split(regexp_replace(text, '[^ -~]', 'x', 'g'),
                                    ''),
                       c -> ascii(c)) AS bytes
            FROM documents
        ), r AS (
            SELECT doc_id, bytes,
                   list_filter(bytes, (x, i) -> (i - 1) % 4 = 0) AS small
            FROM b
        )
        SELECT doc_id,
               len(bytes) AS orig_bytes,
               len(small) AS resized_bytes,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                           list_transform(small, x -> CAST(x AS BIGINT))),
                           (a, b) -> a + b) AS resized_sum
        FROM r
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary->binary resize plumbing (nearest-neighbor byte downsample
    in mapInPandas), checked via exact integer digests — ASCII payloads
    give DuckDB a byte-level twin."""
    docs = load_table(spark, sf_dir, "documents")
    return MM.resize_payload(MM.attach_binary(docs))


@register(
    "multimodal_feature_ann_recall",
    ops=("OP-X-MM-01", "OP-X-SIM-01"),
    # the multimodal -> ANN COMPOSITION: decode-stage embeddings (byte
    # histograms standing in for a learned encoder) are searched with
    # the IVF index. The top-k set is index-defined (no SQL twin); the
    # oracle-checkable quality is IVF recall vs the exact BLAS top-k
    # over the SAME feature vectors — >= 1/2, integer arithmetic.
    oracle="SELECT TRUE AS recall_ok",
)
def multimodal_feature_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Find similar media items by decoded features, end-to-end:
    attach payloads -> Arrow-batched featurize (byte-histogram
    embedding, multimodal/binary.byte_histogram_embedding) -> IVF
    search, verdict-pinned against exact brute force on the same
    vectors. The composition a multimodal dedup/retrieval pipeline
    actually runs; swap the histogram UDF for a real model and nothing
    else changes."""
    from ..operators import similarity as S
    from .similarity import _topk_recall_verdict

    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    emb = MM.byte_histogram_embedding(MM.attach_binary(docs)).localCheckpoint(
        eager=False
    )
    queries = emb.where(F.col("vec_id") < 10)
    exact = S.brute_force_topk_np(emb, queries, k=10)
    approx = S.ivf_topk(emb, queries, k=10, n_cells=10, nprobe=4)
    return _topk_recall_verdict(exact, approx, num=2, den=1)
