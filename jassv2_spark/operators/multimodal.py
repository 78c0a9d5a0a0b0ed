"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as `binary` payload columns
with a typed metadata struct, processed by Arrow-batched pandas UDFs over
`mapInPandas` — payloads never pass through Python row-at-a-time, and the
big win at scale is that Spark only shuttles the (usually small) selected
columns thanks to column pruning, while payloads stream per-batch.

The actual codec work (JPEG decode, audio resample, video demux) needs
libraries this container doesn't ship, so the decode kernels are STUBS:
`decode_media` raises NotImplementedError unless `fake=True`, in which
case a clearly-marked deterministic fake (header-derived) stands in. The
Spark-side plumbing — schemas, UDF signatures, Arrow batch shapes,
partitioning — is real and tested; swapping in PIL/ffmpeg later changes
only the kernel body.

Media table schema (the `media()` helper builds it):
  media_id: long, kind: string ('image'|'audio'|'video'),
  payload: binary,
  meta: struct<width int, height int, channels int,
               sample_rate int, n_frames int>
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("meta", META_SCHEMA, True),
    ]
)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from any text table (for tests/benches):
    payload = utf-8 bytes of the text, metadata derived from its length."""
    payload = F.encode(F.col(text_col), "utf-8")
    n = F.octet_length(payload)
    meta = F.struct(
        (n % 640 + 1).cast("int").alias("width"),
        (n % 480 + 1).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        (n % 24 + 1).cast("int").alias("n_frames"),
    )
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def _pillow():
    """Optional-dependency probe: PIL.Image or None (never raises)."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except Exception:
        return None


def decode_media(media: DataFrame, fake: bool = False,
                 kinds: tuple[str, ...] | None = None) -> DataFrame:
    """Decode payloads to dense pixel/sample arrays.

    With fake=True a deterministic stand-in emits the first
    width-or-sample_rate bytes as float values in [0, 1) — the oracle
    path; the schema and batch plumbing are exactly what a real decoder
    uses. With fake=False the REAL path decodes image payloads via Pillow
    when it is installed (optional dependency; grayscale-flattened pixels
    normalized to [0, 1)), audio payloads via the stdlib ``wave`` module
    (RIFF/WAV PCM → float samples in [-1, 1), no dependency), and video
    payloads via a stdlib RIFF/AVI demux (first uncompressed frame →
    [0, 1) floats; compressed codecs still need external libraries and
    such payloads are dropped). ``kinds`` restricts decoding to the
    named kinds — pass ``kinds=("audio",)`` / ``("video",)`` (or both)
    to use the dependency-free paths without Pillow installed. Without
    Pillow, a real path that may include images raises
    NotImplementedError (install pillow, pass fake=True, or narrow
    ``kinds``)."""
    if kinds is not None:
        media = media.where(F.col("kind").isin(*kinds))
    if not fake:
        if _pillow() is None and (kinds is None or "image" in kinds):
            raise NotImplementedError(
                "real media decode requires Pillow (pip install pillow) "
                "for image payloads, absent in this environment; pass "
                "fake=True, or kinds=('audio',) for the stdlib-wave path"
            )
        return _decode_media_real(media)

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("n_values", IntegerType(), False),
            StructField("values", ArrayType(DoubleType(), False), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if payload is None:
                    continue
                limit = int(meta["width"] if kind == "image" else meta["sample_rate"] or 64)
                arr = np.frombuffer(payload[: max(1, min(limit, 64))], dtype=np.uint8)
                vals = (arr.astype(np.float64) / 256.0).tolist()
                rows.append((int(mid), kind, len(vals), vals))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "n_values", "values"])

    return media.mapInPandas(run, schema=out_schema)


def _decode_audio_wav(payload: bytes) -> list[float] | None:
    """stdlib RIFF/WAV PCM decode → float samples in [-1, 1). Handles the
    8-bit unsigned, 16-bit and 32-bit signed little-endian PCM widths the
    ``wave`` module exposes; multi-channel frames are interleaved as
    stored. Returns None for payloads that aren't valid WAV."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except Exception:
        return None
    if width == 1:  # 8-bit WAV is unsigned, midpoint 128
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        arr = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:  # 24-bit and exotic widths: out of stdlib-comfort scope
        return None
    return arr.tolist()


def _decode_video_avi(payload: bytes) -> list[float] | None:
    """stdlib RIFF/AVI demux: walk the container ('RIFF'/'AVI ' → LIST
    'movi' → '##db'/'##dc' chunks) and take the FIRST decodable video
    frame, normalized to [0, 1) floats — the per-frame analogue of the
    image path's grayscale flatten.  '##db' (uncompressed/DIB) frames
    use the raw bytes directly; '##dc' (compressed — MJPEG) frames route
    through the same Pillow gate as the image path: decoded to grayscale
    when Pillow is importable, skipped otherwise.  Anything that does not
    parse as AVI, or whose frames all fail to decode, returns None and
    the row is dropped."""
    import struct as _struct

    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None

    def walk(buf: bytes, at: int, end: int):
        # Iterative with an explicit stack: a hostile payload of deeply
        # nested LIST chunks must exhaust the scan, not Python's recursion
        # limit — undecodable rows are dropped, never a task failure.
        stack = [(at, end)]
        while stack:
            at, end = stack.pop()
            while at + 8 <= end:
                fourcc = buf[at : at + 4]
                (size,) = _struct.unpack_from("<I", buf, at + 4)
                body_at = at + 8
                body_end = min(body_at + size, end)
                next_at = body_at + size + (size & 1)  # chunks are word-aligned
                if next_at <= at:  # zero/overflowed size: refuse to loop forever
                    break
                if fourcc in (b"LIST", b"RIFF"):
                    stack.append((next_at, end))  # resume after this LIST
                    at, end = body_at + 4, body_end  # descend into it
                    continue
                yield fourcc, buf[body_at:body_end]
                at = next_at

    for fourcc, body in walk(payload, 12, len(payload)):
        if len(fourcc) != 4 or not body:
            continue
        if fourcc[2:4] == b"db":  # uncompressed frame: raw bytes
            arr = np.frombuffer(body, dtype=np.uint8)
            return (arr.astype(np.float64) / 256.0).tolist()
        if fourcc[2:4] == b"dc":  # compressed frame: MJPEG via the Pillow gate
            try:
                import io
                from PIL import Image
                img = Image.open(io.BytesIO(body)).convert("L")
            except Exception:
                continue  # Pillow absent or not a decodable JPEG: try next frame
            arr = np.asarray(img, dtype=np.float64).ravel() / 256.0
            return arr.tolist()
    return None


def _decode_media_real(media: DataFrame) -> DataFrame:
    """Real decode: image payload → Pillow grayscale pixels in [0, 1);
    audio payload → stdlib-wave PCM samples in [-1, 1) (no optional
    dependency). Same output schema as the fake path; Arrow-batched,
    one worker-side open per row (Pillow is lazy — only the header is
    parsed until the pixel access). Video rows and undecodable payloads
    are dropped (a real pipeline would route them to a quarantine sink).
    Pillow is imported lazily per batch so audio-only frames decode on
    workers without it."""
    import io

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("kind", StringType(), False),
            StructField("n_values", IntegerType(), False),
            StructField("values", ArrayType(DoubleType(), False), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = None
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None:
                    continue
                if kind == "audio":
                    vals = _decode_audio_wav(bytes(payload))
                    if vals is not None:
                        rows.append((int(mid), kind, len(vals), vals))
                    continue
                if kind == "video":
                    vals = _decode_video_avi(bytes(payload))
                    if vals is not None:
                        rows.append((int(mid), kind, len(vals), vals))
                    continue
                if kind != "image":
                    continue
                if Image is None:
                    from PIL import Image
                try:
                    img = Image.open(io.BytesIO(payload)).convert("L")
                except Exception:
                    continue
                arr = np.asarray(img, dtype=np.float64).ravel() / 256.0
                rows.append((int(mid), kind, len(arr), arr.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "n_values", "values"])

    return media.mapInPandas(run, schema=out_schema)


def byte_histogram_features(media: DataFrame, bins: int = 64) -> DataFrame:
    """REAL feature extraction: per-payload byte histogram (L1-normalized),
    a genuine content fingerprint usable for near-dup/clustering at scale.
    Vectorized numpy over Arrow batches; one output row per media row."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("features", ArrayType(DoubleType(), False), False),
        ]
    )
    width = 256 // bins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=bins).astype(np.float64)
                total = hist.sum()
                if total > 0:
                    hist /= total
                rows.append((int(mid), len(arr), hist.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "features"])

    return media.select("media_id", "payload").mapInPandas(run, schema=out_schema)


def byte_histogram_counts(media: DataFrame, bins: int = 64) -> DataFrame:
    """Byte histogram as RAW COUNTS in a sortable CSV string:
    (media_id, n_bytes, hist_csv) with hist_csv = comma-joined `bins` integer
    counts. The driver-facing variant of :func:`byte_histogram_features` —
    scalar columns only, so result canonicalization (sort/hash) works, and
    integer counts compare exactly across engines (the L1-normalized array
    form divides by n_bytes, which any consumer can do from these columns)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("hist_csv", StringType(), False),
        ]
    )
    width = 256 // bins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=bins)
                rows.append((int(mid), len(arr), ",".join(str(int(c)) for c in hist)))
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "hist_csv"])

    return media.select("media_id", "payload").mapInPandas(run, schema=out_schema)


def resize_images(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize image payloads. fake=True truncates/pads the payload to
    width*height bytes (deterministic oracle path). fake=False uses
    Pillow's bilinear resample when installed (optional dependency;
    output payload = raw grayscale bytes, meta updated); without Pillow
    it raises NotImplementedError."""
    if not fake:
        if _pillow() is None:
            raise NotImplementedError(
                "real image resize requires Pillow (pip install pillow), "
                "absent in this environment; use fake=True"
            )
        return _resize_images_real(media, width, height)
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), False),
            StructField("meta", META_SCHEMA, False),
        ]
    )
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None or kind != "image":
                    continue
                buf = np.frombuffer(payload, dtype=np.uint8)
                out = np.resize(buf, target)  # deterministic repeat/truncate
                rows.append(
                    (int(mid), out.tobytes(), {"width": width, "height": height,
                                               "channels": 1, "sample_rate": None,
                                               "n_frames": None})
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    return media.mapInPandas(run, schema=out_schema)


def _resize_images_real(media: DataFrame, width: int, height: int) -> DataFrame:
    """Pillow bilinear resize; same schema as the fake path."""
    import io

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), False),
            StructField("meta", META_SCHEMA, False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from PIL import Image

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None or kind != "image":
                    continue
                try:
                    img = Image.open(io.BytesIO(payload)).convert("L")
                except Exception:
                    continue
                out = img.resize((width, height), Image.BILINEAR)
                rows.append(
                    (int(mid), out.tobytes(), {"width": width, "height": height,
                                               "channels": 1, "sample_rate": None,
                                               "n_frames": None})
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload", "meta"])

    return media.mapInPandas(run, schema=out_schema)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video payloads: REAL slicing plumbing — the
    payload is split into meta.n_frames equal chunks and every n-th chunk
    is emitted as its own row (media_id, frame_idx, frame: binary). A real
    demuxer would replace the equal-chunk assumption only."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if payload is None or kind != "video":
                    continue
                n_frames = max(1, int(meta["n_frames"] or 1))
                size = max(1, len(payload) // n_frames)
                for idx in range(0, n_frames, every_n):
                    rows.append((int(mid), idx, payload[idx * size : (idx + 1) * size]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(run, schema=out_schema)


def ahash_64(media: DataFrame) -> DataFrame:
    """(media_id, n_bytes, ahash, n_same): 64-bit average-hash perceptual
    fingerprint over the payload's first 64 bytes — the classic aHash
    (mean-threshold bitmap) that image-dedup pipelines run on downscaled
    pixels; here the "pixels" are the raw payload prefix, which is exactly
    what aHash degenerates to without a decoder (swap the byte prefix for
    an 8×8 grayscale resample when PIL lands — only the value source
    changes). bit_j = 1 iff byte_j > floor-mean of the prefix; payloads
    shorter than 64 bytes zero-pad the tail. n_same counts payloads
    sharing a fingerprint (the near-dup candidate group size).

    Unlike the histogram kernels this stays PURE JVM: it touches a fixed
    ≤64-byte prefix per row (hex + conv + one in-row aggregate), so an
    Arrow round-trip would cost more than the arithmetic. Exact integer
    mean ⇒ engine-portable. One window keyed on the 64-char fingerprint
    for n_same — a (hash)-keyed exchange, hot only for true dup farms."""
    vals = (
        "transform(sequence(0, cast(least(64, octet_length(payload)) as int) - 1),"
        " j -> cast(conv(substr(hex(payload), j * 2 + 1, 2), 16, 10) as int))"
    )
    withv = media.select(
        "media_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.expr(vals).alias("__v"),
    )
    mean = F.expr(
        "aggregate(__v, cast(0 as bigint), (a, v) -> a + v) div size(__v)"
    )
    bits = (
        "array_join(transform(sequence(0, 63),"
        " j -> CASE WHEN j < size(__v) AND element_at(__v, cast(j as int) + 1) > __m"
        " THEN '1' ELSE '0' END), '')"
    )
    from pyspark.sql import Window

    hashed = (
        withv.where(F.size("__v") > 0)
        .withColumn("__m", mean)
        .select("media_id", "n_bytes", F.expr(bits).alias("ahash"))
    )
    w = Window.partitionBy("ahash")
    return hashed.select(
        "media_id", "n_bytes", "ahash", F.count(F.lit(1)).over(w).cast("long").alias("n_same")
    )
