"""Real PNM decode (OP-X-MM-01): dependency-free header/pixel parser,
the engine-side PPM encoder, and per-item error isolation in the
mapInPandas featurizer."""

from __future__ import annotations

import pytest

from crawlingbigdatavisionaid_spark.multimodal.binary import (
    attach_ppm,
    decode_image,
    decode_image_features,
)


def _p6(w: int, h: int, pixels: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def test_decode_p6_rgb():
    # 2x1 RGB: pixel0 = (1,2,3), pixel1 = (4,5,6)
    d = decode_image(_p6(2, 1, bytes([1, 2, 3, 4, 5, 6])))
    assert (d["width"], d["height"], d["channels"]) == (2, 1, 3)
    assert d["n_pixels"] == 2
    assert d["channel_sums"] == [1 + 4, 2 + 5, 3 + 6]


def test_decode_p5_grayscale():
    d = decode_image(b"P5\n3 2\n255\n" + bytes([10, 20, 30, 40, 50, 60]))
    assert (d["width"], d["height"], d["channels"]) == (3, 2, 1)
    assert d["channel_sums"] == [210]


def test_decode_header_comments_and_whitespace():
    payload = b"P6 # rgb image\n# a comment line\n 2\t1 # dims\n255\n" + bytes(
        [1, 2, 3, 4, 5, 6]
    )
    d = decode_image(payload)
    assert (d["width"], d["height"]) == (2, 1)


@pytest.mark.parametrize(
    "payload",
    [
        b"",  # empty
        b"\xff\xd8\xff\xe0JFIF",  # JPEG magic — codec formats rejected
        b"\x89PNG\r\n",  # PNG magic
        b"P6\n2 1\n255\n\x01\x02",  # truncated pixel array
        b"P6\n2 1\n65535\n" + bytes(12),  # 16-bit unsupported
        b"P6\n0 1\n255\n",  # non-positive dims
        b"P6\nx y\n255\n",  # non-numeric header
    ],
)
def test_decode_rejects_malformed(payload):
    with pytest.raises(ValueError):
        decode_image(payload)


def test_featurizer_isolates_bad_payloads(spark):
    rows = [
        (1, _p6(2, 1, bytes([1, 2, 3, 4, 5, 6]))),
        (2, b"\xff\xd8not an image"),
        (3, _p6(1, 1, bytes([7, 8, 9]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r.asDict() for r in decode_image_features(df).collect()}
    assert set(got) == {1, 3}  # the corrupt payload drops, batch survives
    assert got[1]["sum_r"] == 5 and got[1]["sum_g"] == 7 and got[1]["sum_b"] == 9
    assert got[3]["n_pixels"] == 1


def test_ppm_roundtrip_matches_encode_arithmetic(spark, sf_dir):
    from crawlingbigdatavisionaid_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20)
    out = {r["doc_id"]: r for r in decode_image_features(attach_ppm(docs)).collect()}
    want = {r["doc_id"]: r["text"] or "" for r in docs.collect()}
    assert set(out) == set(want)
    for doc_id, text in want.items():
        r = out[doc_id]
        w, h = 4 + doc_id % 5, 3 + doc_id % 4
        assert (r["width"], r["height"]) == (w, h)
        raw = text.encode()[: w * h * 3].ljust(w * h * 3, b"x")
        assert r["sum_r"] == sum(raw[0::3])
        assert r["sum_g"] == sum(raw[1::3])
        assert r["sum_b"] == sum(raw[2::3])
