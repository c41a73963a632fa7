"""Multimodal columns — binary payloads + typed metadata, real codecs.

Images/audio/video ride as opaque ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` UDFs so payload bytes cross to Python once per batch, never
per row.  The codec layer (`functions/codecs.py`) is pure numpy over real
container formats — binary PPM/PGM images, 24-bit BMP, PCM16 WAV audio,
YUV4MPEG2 (Y4M) video — so the decode step is genuinely end-to-end in this
environment; a deployment with PIL/ffmpeg swaps the codec table, not the
operators.

At 100 TB scale the payload column dominates I/O: every operator here
projects only (media_id, kind, payload) before the UDF so Parquet column
pruning drops the rest, and feature outputs are fixed-width float32 arrays
(grid^2+2 / n_frames+2) so downstream similarity joins are bounded-width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from anomaly_detector_spark.functions import codecs

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),          # image|audio|video
        T.StructField("payload", T.BinaryType(), True),         # encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("container", T.StringType(), True),       # sniffed format
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

THUMB_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("thumb", T.BinaryType(), True),           # re-encoded PPM
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_ms", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _synth_pixels(media_id: int, h: int = 32, w: int = 32) -> np.ndarray:
    """Deterministic RGB test pattern parameterized by media_id."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1) + media_id * 37) % 256
    g = (yy * 255 // max(h - 1, 1) + media_id * 101) % 256
    b = ((xx + yy) * 7 + media_id) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def _synth_payload(media_id: int, kind: str) -> tuple[bytes, int, int, int, str]:
    """(payload, width, height, duration_ms, codec) for one synthetic row."""
    if kind == "image":
        px = _synth_pixels(media_id)
        if media_id % 2 == 0:
            return codecs.encode_ppm(px), 32, 32, 0, "ppm"
        return codecs.encode_bmp(px), 32, 32, 0, "bmp"
    if kind == "audio":
        rate = 8000
        n = rate // 2  # 500 ms
        freq = 200.0 + (media_id % 16) * 50.0
        t = np.arange(n, dtype=np.float32) / rate
        pcm = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
        return codecs.encode_wav(pcm, rate), 0, 0, 500, "wav"
    # video: 8 frames of a moving pattern, 25 fps -> 320 ms
    frames = np.stack([_synth_pixels(media_id + i, 16, 16) for i in range(8)])
    return codecs.encode_y4m(frames, fps=25), 16, 16, 320, "y4m"


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL encoded payloads, generated
    distributed (the encoder runs inside mapInPandas, not on the driver)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for media_id in pdf["media_id"]:
                media_id = int(media_id)
                kind = ("image", "audio", "video")[(media_id * 2654435761 + seed) % 3]
                payload, w, h, dur, codec = _synth_payload(media_id, kind)
                rows.append((media_id, kind, payload, {"width": w, "height": h,
                                                       "duration_ms": dur, "codec": codec}))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    base = spark.range(n).withColumnRenamed("id", "media_id")
    return base.mapInPandas(gen, MEDIA_SCHEMA)


def _decode_feature(payload: bytes | None, grid: int = 4) -> tuple[str | None, bool, list | None]:
    """(container, ok, feature) for one payload — dispatch by magic bytes."""
    container = codecs.sniff_kind(payload)
    if container is None:
        return None, False, None
    try:
        if container in ("ppm", "pgm", "bmp"):
            img = codecs.decode_ppm(payload) if container in ("ppm", "pgm") else codecs.decode_bmp(payload)
            return container, True, codecs.image_feature(img, grid).tolist()
        if container == "wav":
            samples, _rate = codecs.decode_wav(payload)
            return container, True, codecs.audio_feature(samples, n_frames=grid * grid).tolist()
        if container == "y4m":
            frames, _fps = codecs.decode_y4m(payload, every=2)
            feats = np.stack([codecs.image_feature(f, grid) for f in frames])
            return container, True, feats.mean(axis=0).astype(np.float32).tolist()
    except ValueError:
        pass
    return container, False, None


def extract_features(media: DataFrame, grid: int = 4) -> DataFrame:
    """Arrow-batched decode + fixed-width feature extraction.

    Every modality yields a (grid^2+2)-dim float32 vector (image: pooled
    luma; audio: framed RMS; video: frame-feature mean) so the output column
    is uniform and joinable against the embeddings similarity operators.
    Malformed payloads surface as decode_ok=False rows, never exceptions."""

    def fn(batches):
        for pdf in batches:
            cont, ok, feat = [], [], []
            for p in pdf["payload"]:
                c, o, f_ = _decode_feature(p, grid)
                cont.append(c)
                ok.append(o)
                feat.append(f_)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "container": cont,
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["payload"]],
                    "decode_ok": ok,
                    "feature": feat,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(fn, FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_h: int = 8, out_w: int = 8,
                  method: str = "area") -> DataFrame:
    """Decode image payloads, resize (area mean-pool or nearest), re-encode
    as PPM thumbnails.  Undecodable rows are dropped (filter, not error)."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for media_id, p in zip(pdf["media_id"], pdf["payload"]):
                container = codecs.sniff_kind(p)
                if container not in ("ppm", "pgm", "bmp"):
                    continue
                try:
                    img = codecs.decode_ppm(p) if container in ("ppm", "pgm") else codecs.decode_bmp(p)
                except ValueError:
                    continue
                if method == "nearest":
                    small = codecs.resize_nearest(img, out_h, out_w)
                else:
                    small = np.clip(codecs.resize_area(img, out_h, out_w), 0, 255).astype(np.uint8)
                rows.append((int(media_id), out_w, out_h, codecs.encode_ppm(small)))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "thumb"])

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(fn, THUMB_SCHEMA)
    )


def sample_frames(media: DataFrame, every: int = 2, grid: int = 4) -> DataFrame:
    """Video frame sampling: decode every `every`-th frame of each Y4M
    payload and emit one feature row per sampled frame.  The frame skip
    happens at the byte level inside the decoder, so unsampled frames are
    never colorspace-converted."""

    def fn(batches):
        for pdf in batches:
            rows = []
            for media_id, p in zip(pdf["media_id"], pdf["payload"]):
                if codecs.sniff_kind(p) != "y4m":
                    continue
                try:
                    frames, fps = codecs.decode_y4m(p, every=every)
                except ValueError:
                    continue
                for j, frame in enumerate(frames):
                    ts_ms = int(j * every * 1000 / fps)
                    rows.append((int(media_id), j * every, ts_ms,
                                 codecs.image_feature(frame, grid).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "feature"])

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(fn, FRAME_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Metadata-only frame-sampling plan: one row per (media_id, frame_ts)
    without touching payloads — the explode happens JVM-side so a decoder
    stage can be sized/partitioned before any bytes move."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
        .orderBy("media_id", "frame_ts_ms")
    )
