"""Perceptual near-dup hashing (operators/perceptual): dHash semantics,
pigeonhole-banded Hamming retrieval exactness, and the recall contract
of the registered queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlingbigdatavisionaid_spark.multimodal.binary import (
    attach_ppm,
    attach_wav,
)
from crawlingbigdatavisionaid_spark.operators import perceptual as P

SF = "/root/testdata/sf0.001"


def _p6(w: int, h: int, pixels: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def _p5(w: int, h: int, pixels: bytes) -> bytes:
    return b"P5\n%d %d\n255\n" % (w, h) + pixels


def _hash_of(spark, payload: bytes) -> int:
    df = spark.createDataFrame([(0, bytearray(payload))], "doc_id long, payload binary")
    [row] = P.image_dhash(df).collect()
    return row["phash"]


def test_dhash_uniform_image_is_zero(spark):
    # constant intensity: no adjacent-cell mean comparison is strictly
    # greater, so every bit is 0
    assert _hash_of(spark, _p5(8, 6, bytes([77]) * 48)) == 0


def test_dhash_brightness_invariance(spark):
    # dHash's defining property: adding a constant to every pixel
    # leaves every bit unchanged (sum_a*cnt_b vs sum_b*cnt_a both shift
    # by c*cnt_a*cnt_b)
    base = bytes(range(48))
    shifted = bytes(v + 100 for v in base)
    h1 = _hash_of(spark, _p5(8, 6, base))
    h2 = _hash_of(spark, _p5(8, 6, shifted))
    assert h1 == h2
    assert h1 != 0  # and the pattern actually sets bits


def test_dhash_known_gradient(spark):
    # strictly increasing horizontal gradient on a 4x3 P6 image: each
    # grid cell is one pixel, every horizontal comparison fires, no
    # vertical one does -> exactly bits 0..8
    pixels = bytes(
        b for y in range(3) for x in range(4) for b in (x * 10,) * 3
    )
    assert _hash_of(spark, _p6(4, 3, pixels)) == (1 << 9) - 1


def test_banded_equals_brute_image_and_audio(spark):
    from crawlingbigdatavisionaid_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    img = P.image_dhash(attach_ppm(docs)).localCheckpoint()
    b1 = P.hamming_pair_histogram(img, "phash", P.PHASH_BITS, 2).collect()
    b2 = P.hamming_pairs_brute(img, "phash", 2).collect()
    assert [tuple(r) for r in b1] == [tuple(r) for r in b2]
    aud = P.audio_fingerprint(attach_wav(docs)).localCheckpoint()
    a1 = P.hamming_pair_histogram(aud, "fhash", P.AHASH_BITS, 1).collect()
    a2 = P.hamming_pairs_brute(aud, "fhash", 1).collect()
    assert [tuple(r) for r in a1] == [tuple(r) for r in a2]
    # non-degenerate: the corpus must actually contain near pairs
    assert sum(r["n_pairs"] for r in b1) > 0
    assert sum(r["n_pairs"] for r in a1) > 0


def test_grid_signature_determines_hash(spark):
    # the structural recall contract: identical decoded grid => one
    # phash (so exact-duplicate retrieval at distance 0 has recall 1.0)
    from crawlingbigdatavisionaid_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    img = P.image_dhash(attach_ppm(docs))
    mx = (
        img.groupBy("grid_sig")
        .agg(F.countDistinct("phash").alias("nh"))
        .agg(F.max("nh").alias("m"))
        .first()["m"]
    )
    assert mx == 1


def test_hamming_histogram_crafted(spark):
    # hand-built multiplicities: hashes 0b000 x3, 0b001 x2, 0b111 x1
    # (3 bits, radius 1) -> d0 = C(3,2)+C(2,2) = 4, d1 = 3*2 = 6
    rows = [(i, h) for i, h in enumerate([0, 0, 0, 1, 1, 7])]
    df = spark.createDataFrame(rows, "doc_id long, h long")
    got = {
        r["hamming_distance"]: r["n_pairs"]
        for r in P.hamming_pair_histogram(df, "h", 3, 1).collect()
    }
    assert got == {0: 4, 1: 6}


def test_bands_disjoint_and_cover():
    for n_bits, n_bands in ((17, 3), (9, 2), (64, 5)):
        bands = P._bands(n_bits, n_bands)
        seen = set()
        for off, w in bands:
            assert w > 0
            bits = set(range(off, off + w))
            assert not bits & seen
            seen |= bits
        assert seen == set(range(n_bits))
