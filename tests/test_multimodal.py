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


def _wav_bytes(samples, width=2, rate=16000, channels=1) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 1:
            w.writeframes(bytes((s + 128) & 0xFF for s in samples))
        else:
            fmt = "<" + ("h" if width == 2 else "i") * len(samples)
            w.writeframes(struct.pack(fmt, *samples))
    return buf.getvalue()


def test_real_audio_decode_via_stdlib_wave(spark):
    """The REAL audio path needs no optional dependency: RIFF/WAV PCM
    decodes through the stdlib `wave` module — including with Pillow
    absent, via kinds=('audio',)."""
    from jassv2_spark.operators.multimodal import decode_media

    samples = [0, 1000, -1000, 32767, -32768, 12345]
    rows = [
        (1, "audio", bytearray(_wav_bytes(samples)),
         {"width": None, "height": None, "channels": 1,
          "sample_rate": 16000, "n_frames": None}),
        (2, "audio", bytearray(_wav_bytes([5, -5], width=4)),
         {"width": None, "height": None, "channels": 1,
          "sample_rate": 8000, "n_frames": None}),
        (3, "audio", bytearray(b"not a wav"),
         {"width": None, "height": None, "channels": 1,
          "sample_rate": 8000, "n_frames": None}),
        (4, "video", bytearray(b"\x00\x01"),
         {"width": 2, "height": 1, "channels": 1,
          "sample_rate": None, "n_frames": 1}),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,n_frames:int>",
    )
    out = {r["media_id"]: r for r in
           decode_media(media, fake=False, kinds=("audio",)).collect()}
    # undecodable WAV (3) and non-audio kinds (4) are dropped
    assert set(out) == {1, 2}
    got = out[1]["values"]
    assert out[1]["n_values"] == len(samples)
    import pytest as _pytest

    for want, have in zip(samples, got):
        assert have == _pytest.approx(want / 32768.0, abs=1e-9)
    assert all(-1.0 <= v < 1.0 for v in got)
    assert out[2]["n_values"] == 2


def test_real_audio_8bit_unsigned_midpoint(spark):
    from jassv2_spark.operators.multimodal import decode_media

    media = spark.createDataFrame(
        [(7, "audio", bytearray(_wav_bytes([0, 127, -128], width=1)),
          {"width": None, "height": None, "channels": 1,
           "sample_rate": 8000, "n_frames": None})],
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,n_frames:int>",
    )
    (row,) = decode_media(media, fake=False, kinds=("audio",)).collect()
    assert row["values"][0] == 0.0          # unsigned midpoint 128 -> 0
    assert abs(row["values"][1] - 127 / 128) < 1e-9
    assert row["values"][2] == -1.0


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


def _avi_bytes(frames: list[bytes]) -> bytes:
    """Minimal RIFF/AVI: hdrl stub + movi list with 00db (uncompressed)
    frame chunks, word-aligned — enough container for the stdlib demux."""
    import struct

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    hdrl = lst(b"hdrl", chunk(b"avih", bytes(56)))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + __import__("struct").pack("<I", len(body)) + body


def test_real_video_decode_uncompressed_avi(spark):
    """The REAL video path: first uncompressed AVI frame through the
    stdlib RIFF demux — no Pillow, no codec libraries."""
    from jassv2_spark.operators.multimodal import decode_media

    frame0 = bytes([0, 64, 128, 255, 3])
    rows = [
        (1, "video", bytearray(_avi_bytes([frame0, b"\x10\x20"])),
         {"width": 5, "height": 1, "channels": 1, "sample_rate": None,
          "n_frames": 2}),
        (2, "video", bytearray(b"not an avi"),
         {"width": 1, "height": 1, "channels": 1, "sample_rate": None,
          "n_frames": 1}),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,n_frames:int>",
    )
    out = {r["media_id"]: r for r in
           decode_media(media, fake=False, kinds=("video",)).collect()}
    assert set(out) == {1}  # non-AVI payload dropped
    assert out[1]["n_values"] == len(frame0)
    assert out[1]["values"] == [b / 256.0 for b in frame0]


def test_video_decode_hostile_deep_nesting_no_recursion_error():
    """A malformed AVI of deeply nested LIST chunks must be dropped (None),
    not blow Python's recursion limit and kill the Spark task — the walk is
    an explicit-stack iteration (advice r4)."""
    import struct
    from jassv2_spark.operators.multimodal import _decode_video_avi

    depth = 5000  # far beyond the default recursion limit at ~12 B/level
    inner = b""
    for _ in range(depth):
        body = b"movi" + inner
        inner = b"LIST" + struct.pack("<I", len(body)) + body
    payload = b"RIFF" + struct.pack("<I", len(b"AVI " + inner)) + b"AVI " + inner
    assert _decode_video_avi(payload) is None

    # zero-size / overflowed chunk sizes must terminate, not spin
    evil = b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"AVI " + b"LIST" + struct.pack("<I", 0) + b""
    assert _decode_video_avi(evil) is None


def test_video_decode_frame_after_nested_list():
    """The iterative walk must still resume scanning AFTER a descended LIST:
    a frame chunk that follows a sibling LIST is found."""
    import struct
    from jassv2_spark.operators.multimodal import _decode_video_avi

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", bytes(56)))
    frame = bytes([7, 9, 250])
    movi = chunk(b"LIST", b"movi" + chunk(b"00db", frame))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    vals = _decode_video_avi(payload)
    assert vals == [b / 256.0 for b in frame]


def test_video_decode_mjpeg_dc_frame_pillow_gated():
    """'##dc' (MJPEG) frames route through the Pillow gate: with Pillow the
    JPEG decodes to grayscale [0,1) floats; without it the frame is skipped
    (and a later '##db' frame can still win)."""
    import io
    import struct
    from jassv2_spark.operators.multimodal import _decode_video_avi

    try:
        from PIL import Image
    except ImportError:
        import pytest
        pytest.skip("Pillow not installed — MJPEG video path gated off")

    img = Image.new("L", (2, 2))
    img.putdata([0, 64, 128, 255])
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=100)
    jpeg = buf.getvalue()

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", bytes(56)))
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", jpeg))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    vals = _decode_video_avi(payload)
    assert vals is not None and len(vals) == 4
    assert all(0.0 <= v < 1.0 for v in vals)


def test_video_decode_dc_frame_skipped_without_pillow_falls_to_db():
    """Without Pillow (or with an undecodable dc payload) the scan continues
    to the next frame instead of returning garbage raw bytes of a
    compressed stream."""
    import struct
    from jassv2_spark.operators.multimodal import _decode_video_avi

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    frame = bytes([1, 2, 3, 4])
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", b"\xde\xad") + chunk(b"00db", frame))
    body = b"AVI " + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _decode_video_avi(payload) == [b / 256.0 for b in frame]
