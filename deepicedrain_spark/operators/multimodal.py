"""Multimodal (image/audio/video) column plumbing (beyond-reference
extension): opaque ``binary`` payloads + typed metadata structs, with
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` operators.

Two modes per operator:
  - mode='real'  → image, audio AND video decode for real via the
    pure-stdlib codecs in ``functions/codecs.py`` / ``jpeg.py`` (PNG
    at every legal layout, baseline JPEG, WAV PCM8/16/24/32 + float32,
    RIFF/AVI both uncompressed DIB and Motion-JPEG — round 8): stats
    are over decoded pixels/samples, resize/resample operate in
    pixel/sample space and re-encode, and frame sampling walks real
    container frames (each re-encoded PNG). Inter-frame-compressed
    video (H.264 etc.) remains a NotImplementedError seam — no
    practical pure-Python implementation exists, and a fake one would
    be demo-math wearing a production label.
  - mode='fake'  → a deterministic stand-in computed from the raw
    bytes (kept for payloads that are not PNG/WAV, and as the
    plumbing-only path the round-2 oracles pin).

Spark-side design is identical in both modes: binary columns travel in
Arrow record batches; mapInPandas streams batches (constant memory per
task); decode parallelism == partition count, so `repartition(n)` is
the throughput knob; metadata lives in a struct column so Catalyst
prunes it when untouched.
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


def _spread(df: DataFrame, min_rows_per_task: int | None = None) -> DataFrame:
    """Per-row Python codec maps must not inherit a single-file scan's
    one partition (a small parquet yields one task, serializing every
    encode/decode into one Python worker — measured 30.9 s → 2.5 s for
    the MJPG fixture at sf0.1 on local[32]).  Repartition the id frame
    across the cluster's task slots; the shuffle moves only ids.

    Round 10 — ADAPTIVE: tiny inputs were paying the full fence (an
    exchange + defaultParallelism Python-worker spinups) for a scale
    optimization they don't need, so the task count is now sized to
    ceil(n / min_rows_per_task), capped at defaultParallelism.  Every
    call site is a first-stage attach_* builder whose input is an
    id-only projection of a source table, so the count() here is one
    cheap column scan; downstream decode/resample stages inherit the
    chosen partitioning and never re-count.  ``min_rows_per_task`` is
    the per-codec cost knob: None (heavy encoders — JPEG/MJPEG/AVI,
    pure-Python DCT + Huffman per block) keeps the unconditional full
    spread and skips the count job entirely (a handful of rows already
    saturates a task there, so sizing can't help but the count would
    still cost a job); cheap encoders (WAV byte packing, small PNGs)
    pass a floor in the tens-to-hundreds."""
    import math

    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    cur = df.rdd.getNumPartitions()
    if cur >= target:
        return df
    if min_rows_per_task is None:
        return df.repartition(target)
    n = df.count()
    want = min(target, max(1, math.ceil(n / min_rows_per_task)))
    if want > cur:
        return df.repartition(want)
    return df


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


def attach_png_media(df: DataFrame, id_col: str) -> DataFrame:
    """Real-PNG media table: per row, a gray8 image whose pixels follow
    the closed form px[i] = (id·31 + i·7) mod 256 with W = id%16+8,
    H = id%12+6 — deterministic, so an oracle can recompute every pixel
    stat without decoding (the PNG round trip must be the identity).
    Payloads are ACTUAL PNG bytes (signature, IHDR, zlib IDAT, CRCs)."""
    schema = "media_id string, payload binary, width int, height int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from deepicedrain_spark.functions.codecs import png_encode

        for pdf in it:
            ids, payloads, ws, hs = [], [], [], []
            for raw_id in pdf["_id"]:
                i = int(raw_id)
                w, h = i % 16 + 8, i % 12 + 6
                px = (i * 31 + np.arange(w * h) * 7) % 256
                payloads.append(png_encode(px.astype(np.uint8).reshape(h, w)))
                ids.append(str(i))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "width": ws, "height": hs}
            )

    return _spread(df.select(F.col(id_col).alias("_id")), min_rows_per_task=32).mapInPandas(
        batches, schema=schema
    )


def attach_jpeg_media(df: DataFrame, id_col: str, progressive: bool = False) -> DataFrame:
    """Real-JPEG media table (round 8): per row, a gray image of
    (id%3+1) x (id%4+1) UNIFORM 8x8 blocks, block b's value
    (id·31 + b·7) mod 256, encoded at quality 100 (all quantizers 1).
    Uniform blocks put all energy in the integer DC coefficient, so
    the lossy-in-general codec is EXACT here and a SQL oracle can
    replay every pixel stat — certifying the full Huffman + DCT decode
    path, including restart markers (ids divisible by 5 encode with
    restart_interval=2).  ``progressive=True`` emits SOF2 files instead
    (four-phase scan script: DC first/refine + AC first/refine with EOB
    runs) — same exactness argument, so the same oracle certifies the
    progressive decode path."""
    schema = "media_id string, payload binary, width int, height int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from deepicedrain_spark.functions.jpeg import (
            jpeg_encode,
            jpeg_encode_progressive,
        )

        for pdf in it:
            ids, payloads, ws, hs = [], [], [], []
            for raw_id in pdf["_id"]:
                i = int(raw_id)
                bh, bw = i % 3 + 1, i % 4 + 1
                vals = (i * 31 + np.arange(bh * bw) * 7) % 256
                img = np.repeat(
                    np.repeat(vals.reshape(bh, bw), 8, axis=0), 8, axis=1
                ).astype(np.uint8)
                if progressive:
                    payloads.append(jpeg_encode_progressive(img, quality=100))
                else:
                    rst = 2 if i % 5 == 0 else 0
                    payloads.append(
                        jpeg_encode(img, quality=100, restart_interval=rst)
                    )
                ids.append(str(i))
                ws.append(bw * 8)
                hs.append(bh * 8)
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "width": ws, "height": hs}
            )

    return _spread(df.select(F.col(id_col).alias("_id"))).mapInPandas(
        batches, schema=schema
    )


def attach_wav_media(df: DataFrame, id_col: str, rate: int = 16_000) -> DataFrame:
    """Real-WAV media table: per row, mono PCM16 audio with samples
    s[i] = ((id·13 + i·5) mod 4001) − 2000 and n = id%400+100 — again a
    closed form an oracle can replay sample-exactly."""
    schema = "media_id string, payload binary, n_samples long, sample_rate int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from deepicedrain_spark.functions.codecs import wav_encode

        for pdf in it:
            ids, payloads, counts = [], [], []
            for raw_id in pdf["_id"]:
                i = int(raw_id)
                n = i % 400 + 100
                s = ((i * 13 + np.arange(n) * 5) % 4001) - 2000
                payloads.append(wav_encode(s.astype(np.int16), rate))
                ids.append(str(i))
                counts.append(n)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "n_samples": counts,
                    "sample_rate": rate,
                }
            )

    return _spread(df.select(F.col(id_col).alias("_id")), min_rows_per_task=512).mapInPandas(
        batches, schema=schema
    )


def attach_avi_media(df: DataFrame, id_col: str, fps: int = 10) -> DataFrame:
    """Real-AVI media table: per row an uncompressed RIFF/AVI whose
    frames are closed-form — n_frames = id%4+2, h = id%6+4, w = id%5+4,
    pixel(f, y, x, c) = (id·7 + f·31 + y·13 + x·3 + c·17) mod 256 —
    so an oracle replays every sampled pixel without an AVI parser."""
    schema = "media_id string, payload binary, n_frames int, height int, width int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from deepicedrain_spark.functions.codecs import avi_encode

        for pdf in it:
            rows = {k: [] for k in ("media_id", "payload", "n_frames", "height", "width")}
            for raw_id in pdf["_id"]:
                i = int(raw_id)
                nf, h, w = i % 4 + 2, i % 6 + 4, i % 5 + 4
                f, y, x, c = np.ogrid[0:nf, 0:h, 0:w, 0:3]
                frames = ((i * 7 + f * 31 + y * 13 + x * 3 + c * 17) % 256).astype(
                    np.uint8
                )
                rows["media_id"].append(str(i))
                rows["payload"].append(avi_encode(frames, fps))
                rows["n_frames"].append(nf)
                rows["height"].append(h)
                rows["width"].append(w)
            yield pd.DataFrame(rows)

    return _spread(df.select(F.col(id_col).alias("_id"))).mapInPandas(
        batches, schema=schema
    )


def attach_mjpeg_media(df: DataFrame, id_col: str) -> DataFrame:
    """Real MOTION-JPEG media table (round 8): per row an AVI whose
    '00dc' frames are baseline JPEGs.  Frames are UNIFORM-8x8-block
    gray-as-RGB at quality 100: Y equals the block value exactly
    (0.299+0.587+0.114 = 1) and Cb = Cr = 128 exactly, so every frame
    survives the lossy codec bit-exactly and the closed form
    v(id, frame, block) = (id·7 + frame·31 + block·13) mod 256 is
    SQL-replayable — certifying the MJPG container + JPEG decode path.
    Geometry: nf = id%4+2 frames of (id%2+1) x (id%3+1) blocks."""
    schema = "media_id string, payload binary, n_frames int, height int, width int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from deepicedrain_spark.functions.codecs import avi_encode

        for pdf in it:
            rows = {k: [] for k in ("media_id", "payload", "n_frames", "height", "width")}
            for raw_id in pdf["_id"]:
                i = int(raw_id)
                nf, bh, bw = i % 4 + 2, i % 2 + 1, i % 3 + 1
                frames = np.empty((nf, bh * 8, bw * 8, 3), dtype=np.uint8)
                for fi in range(nf):
                    vals = (i * 7 + fi * 31 + np.arange(bh * bw) * 13) % 256
                    g = np.repeat(
                        np.repeat(vals.reshape(bh, bw), 8, axis=0), 8, axis=1
                    )
                    frames[fi] = g[:, :, None]
                rows["media_id"].append(str(i))
                rows["payload"].append(avi_encode(frames, codec="MJPG", quality=100))
                rows["n_frames"].append(nf)
                rows["height"].append(bh * 8)
                rows["width"].append(bw * 8)
            yield pd.DataFrame(rows)

    return _spread(df.select(F.col(id_col).alias("_id"))).mapInPandas(
        batches, schema=schema
    )


def _check_mode(mode: str) -> None:
    """Fail loudly on a typo'd mode: anything except the two contract
    values would otherwise silently take the fake byte-math path and
    return plausible-looking wrong features."""
    if mode not in ("real", "fake"):
        raise ValueError(f"multimodal: mode must be 'real' or 'fake', got {mode!r}")


def decode_image_features(df: DataFrame, mode: str = "fake") -> DataFrame:
    """Decode → per-image features. Output: media_id, n_bytes,
    mean_byte, max_byte. In mode='real' the payload is parsed as PNG
    and the stats are over DECODED PIXELS (n_bytes = pixel·channel
    count); in mode='fake' they are over the raw payload bytes."""
    _check_mode(mode)
    schema = "media_id string, n_bytes long, mean_byte double, max_byte int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "real":
            # signature-dispatched: PNG or baseline JPEG (round 8)
            from deepicedrain_spark.functions.codecs import image_decode

            for pdf in it:
                n, mean, mx = [], [], []
                for b in pdf["payload"]:
                    px = image_decode(bytes(b)).ravel()
                    n.append(int(px.size))
                    mean.append(float(px.sum()) / px.size if px.size else 0.0)
                    mx.append(int(px.max()) if px.size else 0)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "n_bytes": n,
                        "mean_byte": mean,
                        "max_byte": mx,
                    }
                )
            return
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
    """Resize. mode='real': image decode (PNG or JPEG by signature,
    round 8) → nearest-neighbor resize in pixel space → PNG re-encode
    (lossless output regardless of input container). mode='fake':
    re-packs a payload of exactly width×height bytes by
    tiling/truncating (shape-correct plumbing for non-image
    payloads)."""
    _check_mode(mode)
    schema = "media_id string, payload binary, width int, height int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "real":
            from deepicedrain_spark.functions.codecs import (
                image_decode,
                png_encode,
                png_resize_nearest,
            )

            for pdf in it:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "payload": [
                            png_encode(png_resize_nearest(image_decode(bytes(b)), width, height))
                            for b in pdf["payload"]
                        ],
                        "width": width,
                        "height": height,
                    }
                )
            return
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
    """Audio resampling by the rational rate ratio, nearest-neighbor:
    out[i] = in[(i·src)//dst], n_out = ceil(n·dst/src). mode='real'
    parses the payload as PCM16 WAV, resamples int16 SAMPLES, and
    re-encodes a WAV at dst_rate (n_samples counts samples); the fake
    mode applies the same index rule to raw bytes. Output: media_id,
    payload, n_samples, sample_rate."""
    _check_mode(mode)
    schema = "media_id string, payload binary, n_samples long, sample_rate int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "real":
            from deepicedrain_spark.functions.codecs import (
                wav_decode,
                wav_encode,
                wav_resample_nearest,
            )

            for pdf in it:
                payloads, counts = [], []
                for b in pdf["payload"]:
                    samples, rate = wav_decode(bytes(b))
                    if rate != src_rate:
                        raise ValueError(
                            f"resample_audio: payload rate {rate} != src_rate {src_rate}"
                        )
                    out = wav_resample_nearest(samples, src_rate, dst_rate)
                    payloads.append(wav_encode(out, dst_rate))
                    counts.append(len(out))
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "payload": payloads,
                        "n_samples": counts,
                        "sample_rate": dst_rate,
                    }
                )
            return
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


def decode_audio_stats(df: DataFrame) -> DataFrame:
    """Real WAV decode → per-clip sample stats (the audio analog of
    decode_image_features' real mode). Output: media_id, n_samples,
    sum_sample, max_sample, sample_rate."""
    schema = (
        "media_id string, n_samples long, sum_sample long, "
        "max_sample int, sample_rate int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from deepicedrain_spark.functions.codecs import wav_decode

        for pdf in it:
            n, tot, mx, rates = [], [], [], []
            for b in pdf["payload"]:
                samples, rate = wav_decode(bytes(b))
                n.append(len(samples))
                tot.append(int(samples.astype("int64").sum()))
                mx.append(int(samples.max()) if len(samples) else 0)
                rates.append(rate)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": n,
                    "sum_sample": tot,
                    "max_sample": mx,
                    "sample_rate": rates,
                }
            )

    return df.mapInPandas(batches, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    mode: str = "fake",
    every_n_frames: int = 2,
) -> DataFrame:
    """Frame sampling. fake mode: one row per byte-offset stride (pure
    plumbing). real mode (round 4): payloads are UNCOMPRESSED AVI —
    decode the container, keep every ``every_n_frames``-th frame, and
    emit each sampled frame re-encoded as PNG — the actual shape a
    video pretraining pipeline hands to the image tower. Compressed
    video still raises (the ffmpeg seam). Output is exploded
    (media_id, frame_idx, frame_bytes)."""
    _check_mode(mode)
    schema = "media_id string, frame_idx int, frame_bytes binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if mode == "real":
            from deepicedrain_spark.functions.codecs import avi_decode, png_encode
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if mode == "real":
                    arr, _fps = avi_decode(bytes(payload))
                    # frame_idx = SOURCE frame number (0, N, 2N, ...),
                    # not the sample ordinal — downstream can map back
                    # to container timestamps; fake mode's byte strides
                    # have no source index, so there it is the ordinal
                    for fi in range(0, arr.shape[0], every_n_frames):
                        ids.append(mid)
                        idxs.append(fi)
                        frames.append(png_encode(arr[fi]))
                else:
                    for k, off in enumerate(range(0, len(payload), every_n_bytes)):
                        ids.append(mid)
                        idxs.append(k)
                        frames.append(bytes(payload[off : off + every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return df.mapInPandas(batches, schema=schema)


def frame_stats(df: DataFrame) -> DataFrame:
    """Per-sampled-frame pixel statistics over PNG frame_bytes (the
    sample_frames real-mode output): n_px (all channels), mean and max
    pixel — the image-tower featurization step after frame sampling."""
    schema = "media_id string, frame_idx int, n_px long, mean_px double, max_px int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from deepicedrain_spark.functions.codecs import png_decode

        for pdf in it:
            rows = {k: [] for k in ("media_id", "frame_idx", "n_px", "mean_px", "max_px")}
            for mid, fi, fb in zip(pdf["media_id"], pdf["frame_idx"], pdf["frame_bytes"]):
                px = png_decode(bytes(fb)).astype(np.int64)
                rows["media_id"].append(mid)
                rows["frame_idx"].append(int(fi))
                rows["n_px"].append(int(px.size))
                rows["mean_px"].append(round(float(px.sum()) / px.size, 6))
                rows["max_px"].append(int(px.max()))
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=schema)
