"""Multimodal columns: binary payload + typed metadata plumbing.

The codec layer is stubbed (no image libs in this container — strict mode
raises NotImplementedError), but schema, batch shapes, partitioning and
feature math are real and asserted here."""

import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from sketchlib.multimodal import (attach_media_meta, decode_image_features,
                                  image_stats, sample_frames)


def _payload(i: int, w: int, h: int, nf: int) -> bytes:
    head = struct.pack(">HHB", w, h, nf)
    filler = bytes((i * 31 + j * 7) % 256 for j in range(64))
    return head + filler


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, _payload(i, 16 + i % 3, 8 + i % 5, 1 + i % 4))
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    return attach_media_meta(df, "payload", kind="image").cache()


def test_metadata_struct(media):
    types = dict(media.dtypes)
    assert types["media"].startswith("struct<kind:string,width:int,height:int")
    r = media.orderBy("id").first()
    assert r["media"]["width"] == 16 and r["media"]["height"] == 8
    assert r["media"]["kind"] == "image"


def test_image_stats_jvm_only(media):
    """The metadata/pruning layer never touches the payload decoder."""
    st = image_stats(media)
    rows = {r["id"]: r for r in st.collect()}
    assert rows[0]["n_pixels"] == 16 * 8
    assert rows[1]["n_pixels"] == 17 * 9
    assert all(r["n_bytes"] == 69 for r in rows.values())


def test_decode_features_shapes_and_determinism(media):
    feats = decode_image_features(media, strict=False)
    a = {r["id"]: (tuple(r["mean_rgb"]), r["phash"]) for r in feats.collect()}
    b = {r["id"]: (tuple(r["mean_rgb"]), r["phash"]) for r in
         decode_image_features(media.repartition(7), strict=False).collect()}
    assert a == b  # deterministic across partitionings
    assert len(a) == 40
    assert all(len(v[0]) == 3 and all(0 <= c <= 255 for c in v[0])
               for v in a.values())


def test_decode_strict_raises_without_codec(spark, media):
    try:
        import PIL  # noqa: F401
        pytest.skip("Pillow present; strict path would decode for real")
    except ImportError:
        pass
    with pytest.raises(Exception, match="NotImplementedError|codec not available"):
        decode_image_features(media, strict=True).collect()


def test_sample_frames_plumbing(media):
    frames = sample_frames(media, every_k=2)
    got = frames.groupBy("id").agg(
        F.count("*").alias("n"),
        F.collect_set("frame_idx").alias("idxs")).collect()
    by_id = {r["id"]: r for r in got}
    # id=3 -> n_frames = 1 + 3 % 4 = 4, every_k=2 -> frames {0, 2}
    assert sorted(by_id[3]["idxs"]) == [0, 2]
    # every payload yields at least frame 0
    assert all(0 in r["idxs"] for r in got) and len(by_id) == 40
