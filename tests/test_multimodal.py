"""Multimodal plumbing: schemas, Arrow batching, deterministic fakes,
and the honest NotImplementedError on the real codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_gateway_spark.operators import multimodal as mm
from hive_gateway_spark.session import load_tables


def test_decode_image_stub_is_honest():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"IMGFxxxx")


def test_decode_assets_schema_and_determinism(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    assets = mm.payloads(t)
    d1 = mm.decode_assets(assets)
    assert [f.name for f in d1.schema] == [
        "doc_id", "width", "height", "channels", "mean_byte", "n_frames",
    ]
    a = sorted(map(tuple, d1.collect()))
    b = sorted(map(tuple, mm.decode_assets(assets).collect()))
    assert a == b
    assert len(a) == t["documents"].count()
    # dims agree with the metadata struct (same derivation)
    meta = {r["doc_id"]: r for r in assets.select("doc_id", "meta.*").collect()}
    for row in a[:50]:
        doc_id, width, height = row[0], row[1], row[2]
        assert width == meta[doc_id]["width"]
        assert height == meta[doc_id]["height"]


def test_resize_and_frame_sample(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    assets = mm.payloads(t)
    thumbs = mm.resize_assets(assets, 64, 48)
    rows = thumbs.collect()
    assert len(rows) == t["documents"].count()
    assert all(r["width"] == 64 and r["height"] == 48 for r in rows)
    assert all(len(bytes(r["thumb"])) > 0 for r in rows)

    frames = mm.sample_frames(assets, every_n_bytes=64, max_frames=4)
    fdf = frames.groupBy("doc_id").agg(F.count("*").alias("n"), F.max("frame_no").alias("mx"))
    stats = fdf.collect()
    assert all(1 <= r["n"] <= 4 and r["mx"] == r["n"] - 1 for r in stats)
    # fan-out joins back 1:N cleanly
    joined = frames.join(assets.select("doc_id", "source"), "doc_id")
    assert joined.count() == frames.count()


def _ppm(w, h, px):
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + bytes(px)


def _bmp24(w, h, rows_topdown):
    """Minimal uncompressed 24-bit BMP, bottom-up row order, BGR."""
    import struct

    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(rows_topdown):  # bottom-up
        line = b"".join(bytes([b_, g, r]) for (r, g, b_) in row)
        body += line + b"\x00" * (stride - len(line))
    pix_off = 54
    header = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info + body


def test_real_decode_ppm_and_bmp(spark):
    """The decode kernel is REAL for codec-free formats: PPM P6 and
    24-bit BMP parse to exact pixels through the Spark mapInPandas path;
    unsupported formats are routed away, not faked."""
    from hive_gateway_spark.operators.multimodal import (
        decode_assets_real,
        decode_image,
        resize_image,
    )

    # 2x1 PPM: red, blue
    ppm = _ppm(2, 1, [255, 0, 0, 0, 0, 255])
    d = decode_image(ppm)
    assert (d["width"], d["height"], d["channels"]) == (2, 1, 3)
    assert d["pixels"][0, 0].tolist() == [255, 0, 0]
    assert d["pixels"][0, 1].tolist() == [0, 0, 255]

    # 2x2 BMP: white/black checkerboard; stride padding + BGR + bottom-up
    bmp = _bmp24(2, 2, [[(255, 255, 255), (0, 0, 0)], [(0, 0, 0), (255, 255, 255)]])
    d2 = decode_image(bmp)
    assert (d2["width"], d2["height"]) == (2, 2)
    assert d2["pixels"][0, 0].tolist() == [255, 255, 255]
    assert d2["pixels"][0, 1].tolist() == [0, 0, 0]
    assert d2["pixels"][1, 1].tolist() == [255, 255, 255]

    # through Spark: PPM + BMP decode, JPEG-ish payload dropped
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp)), (3, bytearray(b"\xff\xd8\xff fake"))],
        "doc_id bigint, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_assets_real(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["width"] == 2 and got[1]["height"] == 1
    assert abs(got[1]["mean_byte"] - (255 + 255) / 6) < 1e-9
    assert got[2]["mean_byte"] == 127.5

    # real nearest-neighbor resize: 2x2 checkerboard -> 4x4 blocks
    big = resize_image(d2["pixels"], 4, 4)
    assert big.shape == (4, 4, 3)
    assert big[0, 0].tolist() == [255, 255, 255]
    assert big[0, 3].tolist() == [0, 0, 0]
    assert big[3, 3].tolist() == [255, 255, 255]
