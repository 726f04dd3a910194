"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB media tables: media travel as ``binary`` columns with
a metadata struct alongside; decode / feature-extract / resize /
frame-sample are Arrow-batched transforms over ``mapInPandas`` so bytes
cross the JVM<->Python boundary once per batch. The image/video codecs
are NOT in this environment, so those decode kernels are STUBS — clearly
marked, raising NotImplementedError unless ``fake=True``, in which case
a deterministic md5-seeded fake replaces the codec. Everything AROUND
the kernel (schema, batching, partitioning, signatures) is real and
tested — swap the kernel body for PIL/ffmpeg on a real cluster.

Codec probe history (PIL/cv2/av/soundfile/librosa/imageio/skimage/
torchvision + ffmpeg binary): absent in rounds 2, 3 and 4 — the image/
video stubs stay honest rather than faking a decode. The round-4
re-probe DID find stdlib ``wave`` + ``audioop``, so the AUDIO kernel
(``decode_audio`` / ``audio_features``) is REAL for PCM WAV
containers; compressed codecs (mp3/ogg/aac) still raise.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("nbytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", out: str = "payload"
) -> DataFrame:
    """Pack a column as the opaque binary payload + metadata struct.

    (In production the payload comes off object storage; here we derive
    bytes from text so the pipeline is runnable on the test tables.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("nbytes"),
        F.md5(F.col(text_col)).alias("digest"),
    )
    return df.withColumn(out, payload).withColumn("media_meta", meta)


_FEAT_DIM = 8


def _fake_features(data: bytes) -> list[float]:
    """Deterministic stand-in for a real encoder: md5 -> 8 floats in
    [0,1). STUB — replace with the real model forward pass."""
    h = hashlib.md5(data).digest()
    return [b / 255.0 for b in h[:_FEAT_DIM]]


# JPEG frame-header (SOF) markers carrying dimensions — every C0-CF
# marker except DHT (C4), JPG (C8) and DAC (CC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _jpeg_dims(b: bytes):
    """Walk JPEG segments to the first SOF marker (ITU T.81 B.2.2)."""
    if b[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(b)
    while i + 3 < n:
        if b[i] != 0xFF:
            return None  # desynced — not a well-formed stream
        marker = b[i + 1]
        while marker == 0xFF and i + 2 < n:  # fill bytes
            i += 1
            marker = b[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers, no length field
        if i + 1 >= n:
            return None
        seglen = (b[i] << 8) | b[i + 1]
        if marker in _JPEG_SOF:
            if i + 7 >= n:
                return None
            return {
                "format": "jpeg",
                "width": (b[i + 5] << 8) | b[i + 6],
                "height": (b[i + 3] << 8) | b[i + 4],
                "channels": b[i + 7],
                "bit_depth": b[i + 2],
            }
        if marker == 0xDA:
            return None  # entropy-coded data reached without a SOF
        i += seglen
    return None


# PNG color type -> samples per pixel (spec 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def image_header_meta(data: bytes):
    """REAL container-header metadata — pure stdlib ``struct`` parsing,
    no codec needed (round-4 verdict: the width/height/format that most
    multimodal curation gates on lives in the container header).

    Supported: PNG (IHDR), JPEG (SOF scan), GIF (87a/89a logical screen
    descriptor), BMP (BITMAPINFOHEADER and the ancient BITMAPCOREHEADER).
    Returns {format, width, height, channels, bit_depth} or None for an
    unrecognized/truncated container. PIXEL decode remains honestly
    stubbed in :func:`decode_image` — this reads headers only.
    """
    import struct

    b = bytes(data)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) < 26 or b[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", b[16:24])
        return {
            "format": "png",
            "width": w,
            "height": h,
            "channels": _PNG_CHANNELS.get(b[25]),
            "bit_depth": b[24],
        }
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) < 10:
            return None
        w, h = struct.unpack("<HH", b[6:10])
        # palette-indexed: rendered channels are RGB
        return {
            "format": "gif", "width": w, "height": h,
            "channels": 3, "bit_depth": 1 + (b[10] & 0x07) if len(b) > 10
            else None,
        }
    if b[:2] == b"BM" and len(b) >= 18:
        (hdr_size,) = struct.unpack("<I", b[14:18])
        if hdr_size >= 40 and len(b) >= 30:
            w, h = struct.unpack("<ii", b[18:26])
            (bpp,) = struct.unpack("<H", b[28:30])
            return {
                "format": "bmp", "width": w, "height": abs(h),
                "channels": bpp // 8 if bpp >= 8 else 1,
                "bit_depth": bpp,
            }
        if hdr_size == 12 and len(b) >= 26:
            w, h, _planes, bpp = struct.unpack("<HHHH", b[18:26])
            return {
                "format": "bmp", "width": w, "height": h,
                "channels": bpp // 8 if bpp >= 8 else 1,
                "bit_depth": bpp,
            }
        return None
    return _jpeg_dims(b)


def decode_image(data: bytes, fake: bool = False):
    """Image decode: REAL header metadata (dims/format/channels via
    :func:`image_header_meta`) for PNG/JPEG/GIF/BMP containers; PIXEL
    decode remains a STUB (PIL/cv2 not available in this environment —
    probed rounds 2-5)."""
    meta = image_header_meta(data)
    if meta is not None:
        # header parse succeeded: dims are real, pixels are not decoded
        return {**meta, "pixels": None}
    if fake:
        h = hashlib.md5(data).digest()
        return {"width": 1 + h[0], "height": 1 + h[1], "channels": 3}
    raise NotImplementedError(
        "unrecognized image container and pixel codecs not available "
        "in this environment; run with fake=True or install PIL on "
        "the cluster"
    )


def frame_sample(data: bytes, every_n: int = 10, fake: bool = False):
    """STUB: video frame sampling (ffmpeg not available)."""
    if fake:
        n_frames = 1 + hashlib.md5(data).digest()[2] % 32
        return list(range(0, n_frames, every_n))
    raise NotImplementedError(
        "video codecs not available in this environment; "
        "run with fake=True or install ffmpeg on the cluster"
    )


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """Arrow-batched feature extraction: (id, meta passthrough,
    features array<float>). One mapInPandas pass — the shape a real
    encoder (batched model inference) needs: batch in, batch out,
    features sized _FEAT_DIM."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("nbytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def _run(batches):
        for pdf in batches:
            feats = [
                _fake_features(b) if fake else decode_image(b)
                for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "nbytes": pdf[payload_col].map(len),
                    "features": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_run, out_schema)


def image_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched container-header scan over one mapInPandas pass:
    (id, format, width, height, channels, ok). REAL kernel
    (:func:`image_header_meta`) — unrecognized/corrupt payloads yield
    ok=false with null fields, the per-row containment a 100 TB media
    scan needs."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def _one(data):
        try:
            m = image_header_meta(data)
        except Exception:
            m = None
        if m is None:
            return (None, None, None, None, False)
        return (m["format"], m["width"], m["height"], m["channels"], True)

    def _run(batches):
        for pdf in batches:
            rows = [_one(b) for b in pdf[payload_col]]
            out = pd.DataFrame(
                rows, columns=["format", "width", "height", "channels",
                               "ok"],
            )
            out.insert(0, "id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(_run, out_schema)


def decode_audio(data: bytes) -> dict:
    """REAL audio decode for PCM WAV containers (stdlib ``wave``,
    present in this environment — round-4 probe). Returns header
    metadata {channels, sample_rate, sample_width, n_frames,
    duration_s}. Non-WAV bytes raise ValueError (honest failure);
    compressed codecs raise NotImplementedError like the image stubs.
    """
    import io
    import wave

    b = bytes(data)
    if (
        b[:3] == b"ID3"                                   # mp3 w/ tag
        or b[:2] in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2")  # mp3 frame
        or b[:4] == b"OggS"                               # ogg
        or b[4:8] == b"ftyp"                              # mp4/m4a
    ):
        raise NotImplementedError(
            "compressed audio (mp3/ogg/aac) needs ffmpeg/libav — not "
            "available in this environment"
        )
    try:
        with wave.open(io.BytesIO(b)) as w:
            nf = w.getnframes()
            sr = w.getframerate()
            return {
                "channels": w.getnchannels(),
                "sample_rate": sr,
                "sample_width": w.getsampwidth(),
                "n_frames": nf,
                "duration_s": nf / sr if sr else 0.0,
            }
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a PCM WAV payload: {e}") from e


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched WAV feature extraction over one mapInPandas pass:
    (id, channels, sample_rate, duration_s, rms, peak, ok). REAL
    kernel (wave + audioop) — undecodable payloads yield ok=false
    with null features instead of failing the batch, the per-row
    error containment a 100 TB media scan needs (one corrupt object
    must not kill a 512 MB task)."""
    import audioop
    import io
    import wave

    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("rms", T.IntegerType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("ok", T.BooleanType()),
        ]
    )

    def _one(data):
        try:
            with wave.open(io.BytesIO(bytes(data))) as w:
                nf, sr = w.getnframes(), w.getframerate()
                width = w.getsampwidth()
                frames = w.readframes(nf)
                return (
                    w.getnchannels(), sr,
                    nf / sr if sr else 0.0,
                    audioop.rms(frames, width) if frames else 0,
                    audioop.max(frames, width) if frames else 0,
                    True,
                )
        except (wave.Error, EOFError, ValueError, audioop.error):
            # audioop.error covers decodable-header/bogus-width WAVs
            # (e.g. 40-bit samples): containment must hold for those too
            return (None, None, None, None, None, False)

    def _run(batches):
        for pdf in batches:
            feats = [_one(b) for b in pdf[payload_col]]
            out = pd.DataFrame(
                feats,
                columns=["channels", "sample_rate", "duration_s",
                         "rms", "peak", "ok"],
            )
            out.insert(0, "id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(_run, out_schema)
