"""Multimodal (image/audio/video) column plumbing (beyond-reference
extension): opaque ``binary`` payloads + typed metadata structs, with
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` operators.

The decode step is STUBBED: the real implementations require PIL /
torchaudio / av, none of which are in this container. Each operator
does one of two things, chosen by ``mode``:
  - mode='real'  → raises NotImplementedError at the point the codec
    library would be imported (clearly marked seam);
  - mode='fake'  → a deterministic stand-in computed from the bytes
    (so partitioning, schemas, batch shapes, and downstream plumbing
    are fully real and testable).

Spark-side design is production-shaped regardless of the stub: binary
columns travel in Arrow record batches; mapInPandas streams batches
(constant memory per task); decode parallelism == partition count, so
`repartition(n)` is the throughput knob; metadata lives in a struct
column so Catalyst prunes it when untouched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),  # image|audio|video
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a media table from any string column: payload = utf-8
    bytes (deterministic), metadata derived from payload length. Used
    to exercise the binary-column plumbing on the documents table."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("codec"),
            (F.octet_length(F.col(text_col)) % 64 + 1).cast("int").alias("width"),
            (F.octet_length(F.col(text_col)) % 48 + 1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _require_real_codec(kind: str) -> None:
    raise NotImplementedError(
        f"real {kind} decoding needs a codec library (PIL/torchaudio/av) "
        "that is not available in this container; use mode='fake' for "
        "pipeline plumbing, or install the codec and fill in this seam"
    )


def decode_image_features(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode → per-image features (mean/max byte as stand-ins for
    pixel stats). Output: media_id, n_bytes, mean_byte, max_byte."""
    schema = "media_id string, n_bytes long, mean_byte double, max_byte int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "real":
            _require_real_codec("image")
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len),
                    # deterministic fake "pixel" stats from raw bytes
                    "mean_byte": payloads.map(lambda b: sum(b) / len(b) if len(b) else 0.0),
                    "max_byte": payloads.map(lambda b: max(b) if len(b) else 0),
                }
            )

    return df.mapInPandas(batches, schema=schema)


def resize_image(df: DataFrame, width: int, height: int, mode: str = "fake") -> DataFrame:
    """Resize: fake mode re-packs a payload of exactly width×height
    bytes by tiling/truncating (shape-correct plumbing); real mode is
    the PIL seam."""
    schema = "media_id string, payload binary, width int, height int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "real":
            _require_real_codec("image")
        target = width * height
        for pdf in it:
            def repack(b: bytes) -> bytes:
                if not b:
                    return bytes(target)
                reps = (target + len(b) - 1) // len(b)
                return (b * reps)[:target]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(repack),
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(batches, schema=schema)


def resample_audio(
    df: DataFrame, src_rate: int = 16_000, dst_rate: int = 8_000, mode: str = "fake"
) -> DataFrame:
    """Audio resampling: fake mode treats the payload as mono 8-bit
    PCM and nearest-neighbor resamples by the rational rate ratio —
    out[i] = payload[(i·src)//dst], n_out = ceil(len·dst/src) —
    deterministic byte math any engine can replay; real mode is the
    torchaudio/librosa seam. Output: media_id, payload, n_samples,
    sample_rate."""
    schema = "media_id string, payload binary, n_samples long, sample_rate int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "real":
            _require_real_codec("audio")
        for pdf in it:
            def resample(b: bytes) -> bytes:
                n_out = (len(b) * dst_rate + src_rate - 1) // src_rate
                return bytes(b[(i * src_rate) // dst_rate] for i in range(n_out))

            out = pdf["payload"].map(resample)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "n_samples": out.map(len),
                    "sample_rate": dst_rate,
                }
            )

    return df.mapInPandas(batches, schema=schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, mode: str = "fake") -> DataFrame:
    """Frame sampling: fake mode emits one row per sampled 'frame'
    (byte offset stride); real mode is the av/ffmpeg seam. Output is
    exploded (media_id, frame_idx, frame_bytes) — the real shape a
    video pipeline needs downstream."""
    schema = "media_id string, frame_idx int, frame_bytes binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "real":
            _require_real_codec("video")
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for k, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(bytes(payload[off : off + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return df.mapInPandas(batches, schema=schema)
