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


def decode_image(data: bytes, fake: bool = False):
    """STUB: image decode (PIL not available in this environment)."""
    if fake:
        h = hashlib.md5(data).digest()
        return {"width": 1 + h[0], "height": 1 + h[1], "channels": 3}
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "run with fake=True or install PIL on the cluster"
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
