"""Multimodal binary-column plumbing: schemas, batch shapes, determinism."""

import pytest

from jassv2_spark.operators.multimodal import (
    byte_histogram_features,
    decode_media,
    resize_images,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some text " * (i + 1)) for i in range(9)],
        ["doc_id", "text"],
    )
    return synthesize_media(docs).persist()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_stub_raises(media):
    with pytest.raises(NotImplementedError):
        decode_media(media, fake=False)
    with pytest.raises(NotImplementedError):
        resize_images(media, 8, 8, fake=False)


def test_decode_fake_deterministic(media):
    a = sorted(map(tuple, decode_media(media, fake=True).collect()))
    b = sorted(map(tuple, decode_media(media, fake=True).collect()))
    assert a == b and len(a) == 9
    for _, kind, n_values, values in a:
        assert n_values == len(values) and all(0.0 <= v < 1.0 for v in values)


def test_byte_histogram(media):
    rows = byte_histogram_features(media, bins=64).collect()
    assert len(rows) == 9
    for r in rows:
        assert len(r["features"]) == 64
        assert abs(sum(r["features"]) - 1.0) < 1e-9
        assert r["n_bytes"] > 0


def test_resize_fake(media):
    out = resize_images(media, 8, 4, fake=True).collect()
    n_images = media.where("kind = 'image'").count()
    assert len(out) == n_images
    for r in out:
        assert len(r["payload"]) == 32
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4


def test_frame_sampling(media):
    vids = {r["media_id"]: r for r in media.where("kind = 'video'").collect()}
    out = sample_frames(media, every_n=2).collect()
    assert {r["media_id"] for r in out} == set(vids)
    for r in out:
        assert r["frame_idx"] % 2 == 0
        assert len(r["frame"]) > 0


def test_real_decode_without_pillow_raises_clearly(spark):
    """Optional-dep gating: without Pillow the real path raises the
    documented NotImplementedError; with it, it decodes (skip-covered)."""
    import pytest

    from jassv2_spark.operators.multimodal import (_pillow, decode_media,
                                                   resize_images,
                                                   synthesize_media)

    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    media = synthesize_media(docs)
    if _pillow() is None:
        with pytest.raises(NotImplementedError, match="[Pp]illow"):
            decode_media(media, fake=False)
        with pytest.raises(NotImplementedError, match="[Pp]illow"):
            resize_images(media, 8, 8, fake=False)
        pytest.skip("Pillow not installed — real decode path gated off")
    # with Pillow present: real PNG through decode + resize
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (4, 4), color=128).save(buf, format="PNG")
    png = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()),
          {"width": 4, "height": 4, "channels": 1, "sample_rate": None, "n_frames": None})],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,n_frames:int>",
    )
    out = decode_media(png, fake=False).collect()
    assert out and out[0]["n_values"] == 16
    rs = resize_images(png, 2, 2, fake=False).collect()
    assert rs and len(rs[0]["payload"]) == 4
