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
