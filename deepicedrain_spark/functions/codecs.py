"""Pure-stdlib/numpy media codecs: PNG (gray8 / RGB8) and WAV (PCM16).

These fill the multimodal operators' ``mode='real'`` seam in an
environment with no PIL/soundfile/ffmpeg: both formats are simple,
fully public specifications (PNG: RFC 2083 — zlib-compressed filtered
scanlines in CRC'd chunks; WAV: RIFF container with a PCM ``fmt ``
chunk), so a few hundred lines of numpy implement them exactly.

Video (round 4): UNCOMPRESSED AVI — RIFF 'AVI ' container with DIB
(bottom-up BGR24, 4-byte-padded rows) '00db' frames — is also a fully
public, codec-free format (the same layout VirtualDub/ffmpeg emit for
``-c:v rawvideo``), so the frame-sampling seam now runs on real
container bytes. COMPRESSED video (H.264 etc.) remains a genuine seam:
no pure-Python implementation of a real video codec is practical, and
shipping one would be demo-math pretending to be production.

Decoders accept anything the encoders emit plus the cases a real
corpus would hold (round 8 — every legal PNG layout: bit depths
1/2/4/8/16, color types 0/2/3/4/6 incl. PLTE/tRNS palettes, Adam7
interlace, all five filter types; the stats path aggregates over ALL
decoded channels incl. alpha. WAV: PCM8/16/24/32 and IEEE float32,
mono or interleaved multichannel, first channel returned, everything
normalized to int16. Compressed audio/video stay NotImplementedError
seams).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode uint8 pixels to PNG: (H, W) gray, (H, W, 2) gray+alpha,
    (H, W, 3) RGB, or (H, W, 4) RGBA — every layout png_decode can
    produce, so decode -> transform -> encode round-trips alpha images
    too. Filter type 0 on every scanline (simplicity over ratio —
    ratio is zlib's job; correctness is what the pipeline needs)."""
    if np.asarray(pixels).dtype != np.uint8:
        # uint16 (16-bit PNG decode output) would silently wrap mod 256
        raise ValueError(
            f"png_encode: expected uint8 pixels, got {np.asarray(pixels).dtype}"
        )
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, nch = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        nch = arr.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[nch]  # GA, RGB, RGBA
        h, w = arr.shape[:2]
    else:
        raise ValueError(
            f"png_encode: expected (H,W[,2|3|4]) uint8, got {arr.shape}"
        )
    raw = arr.reshape(h, w * nch)
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raw], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines, level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass geometry: (x_start, y_start, x_step, y_step) per the PNG
# spec's interlace section — pass images are stored consecutively,
# each filtered independently with its own scanline stride
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, off: int, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse scanline filters for one (pass-)image of ``h`` rows of
    ``stride`` bytes starting at byte ``off``; filters operate on BYTES
    with the left neighbor ``bpp`` bytes back (so the same loop serves
    every bit depth). Returns the (h, stride) recovered bytes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for row in range(h):
        base = off + row * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=base + 1).copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up
            cur = line + prev  # uint8 wraps mod 256 — the spec's arithmetic
        elif ftype in (1, 3, 4):  # sub / average / paeth: left-dependent
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                x = int(line[i])
                if ftype == 1:
                    cur[i] = (x + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (x + (a + b) // 2) & 0xFF
                else:
                    cur[i] = (x + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"png_decode: filter type {ftype}")
        out[row] = cur
        prev = cur
    return out


def _png_samples(rows: np.ndarray, w: int, nch: int, depth: int) -> np.ndarray:
    """(h, stride) recovered bytes -> (h, w*nch) samples (uint8 for
    depth <= 8 — sub-byte samples are the raw index values — or uint16
    for depth 16, big-endian per spec)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * nch]
    if depth == 16:
        return rows.reshape(h, -1).view(">u2").astype(np.uint16)[:, : w * nch]
    # depths 1/2/4: legal only with one channel (gray or palette index)
    per = 8 // depth
    shifts = np.array([8 - depth * (i + 1) for i in range(per)], dtype=np.uint8)
    mask = (1 << depth) - 1
    unpacked = (rows[:, :, None] >> shifts[None, None, :]) & mask
    return unpacked.reshape(h, -1)[:, :w].astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes to (H, W) gray or (H, W, C) pixels — uint8, or
    uint16 for 16-bit-depth images.  Round 8: ALL legal bit depth /
    color type combinations (1/2/4/8/16; gray, RGB, palette with
    optional tRNS alpha, gray+alpha, RGBA) and Adam7 interlace — the
    former NotImplementedError seams.  Sub-byte grayscale is scaled to
    full 8-bit range (x * 255/(2^d-1), exact for d in {1,2,4});
    palette images decode through PLTE to RGB (RGBA when tRNS is
    present).  All five filter types on every path."""
    if data[:8] != _PNG_SIG:
        raise ValueError("png_decode: bad PNG signature")
    pos = 8
    idat = b""
    w = h = None
    color_type = None
    plte = trns = None
    while pos < len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        pos += 12 + clen
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if nch is None:
        raise NotImplementedError(f"png_decode: color type {color_type}")
    legal_depths = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(color_type, (8, 16))
    if depth not in legal_depths:
        raise ValueError(f"png_decode: bit depth {depth} with color type {color_type}")
    if color_type == 3 and plte is None:
        raise ValueError("png_decode: palette image without PLTE chunk")
    raw = zlib.decompress(idat)
    bpp = max(1, (nch * depth) // 8)

    def pass_stride(pw: int) -> int:
        return (pw * nch * depth + 7) // 8

    if not interlace:
        stride = pass_stride(w)
        if len(raw) != h * (stride + 1):
            raise ValueError("png_decode: scanline payload size mismatch")
        samples = _png_samples(_png_unfilter(raw, 0, h, stride, bpp), w, nch, depth)
    else:
        samples = np.zeros((h, w * nch), dtype=np.uint16 if depth == 16 else np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue  # empty passes contribute no bytes at all
            stride = pass_stride(pw)
            sub = _png_samples(
                _png_unfilter(raw, off, ph, stride, bpp), pw, nch, depth
            ).reshape(ph, pw, nch)
            view = samples.reshape(h, w, nch)
            view[y0::dy, x0::dx, :] = sub
            off += ph * (stride + 1)
        if off != len(raw):
            raise ValueError("png_decode: interlaced payload size mismatch")
    if color_type == 3:
        idx = samples.reshape(h, w)
        if idx.max() >= len(plte):
            raise ValueError("png_decode: palette index out of range")
        rgb = plte[idx]
        if trns is None:
            return rgb
        alpha = np.full(len(plte), 255, dtype=np.uint8)
        alpha[: len(trns)] = trns
        return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
    if depth < 8:  # sub-byte grayscale: scale to the full 8-bit range
        samples = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    if nch == 1:
        return samples.reshape(h, w)
    return samples.reshape(h, w, nch)


def image_decode(data: bytes) -> np.ndarray:
    """Decode an image payload by container signature: PNG or baseline
    JPEG (round 8) — the two formats a real corpus overwhelmingly
    holds.  Returns (H, W[, C]) pixels."""
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:2] == b"\xff\xd8":
        from deepicedrain_spark.functions.jpeg import jpeg_decode

        return jpeg_decode(data)
    raise ValueError("image_decode: unknown image signature")


def png_resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic choice — no filter
    kernel ambiguity between engines)."""
    h, w = pixels.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return pixels[rows][:, cols]


# ---------------------------------------------------------------------------
# WAV (RIFF / PCM16)
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Mono PCM16 WAV from an int16 (or int-castable) 1-D array."""
    pcm = np.ascontiguousarray(samples, dtype="<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """(first-channel int16 samples, sample rate) from a WAV.  Round 8:
    beyond PCM16, the other linear layouts a real corpus holds decode
    too, normalized to int16 by the standard conversions — PCM8
    (unsigned: (x-128)<<8), PCM24/PCM32 (top 16 bits), and IEEE
    float32 (fmt 3: clip to [-1, 1], scale by 32767, round half away
    from zero).  Compressed formats (ADPCM, mu-law, ...) remain a
    NotImplementedError seam."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav_decode: not a RIFF/WAVE file")
    pos = 12
    rate = channels = None
    audio_fmt = bits = None
    payload = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
        elif ctype == b"data":
            payload = body
    if rate is None or payload is None:
        raise ValueError("wav_decode: missing fmt/data chunk")
    if audio_fmt == 1 and bits == 16:
        samples = np.frombuffer(payload, dtype="<i2").astype(np.int16)
    elif audio_fmt == 1 and bits == 8:
        samples = ((np.frombuffer(payload, dtype=np.uint8).astype(np.int16) - 128) << 8)
    elif audio_fmt == 1 and bits == 24:
        b = np.frombuffer(payload, dtype=np.uint8)
        b = b[: len(b) - len(b) % 3].reshape(-1, 3)
        # top 16 of the little-endian 24: bytes 1..2 ARE the int16
        samples = (b[:, 1].astype(np.uint16) | (b[:, 2].astype(np.uint16) << 8)).view(
            np.int16
        ).astype(np.int16)
    elif audio_fmt == 1 and bits == 32:
        samples = (np.frombuffer(payload, dtype="<i4") >> 16).astype(np.int16)
    elif audio_fmt == 3 and bits == 32:
        f = np.clip(np.frombuffer(payload, dtype="<f4").astype(np.float64), -1.0, 1.0)
        x = f * 32767.0
        samples = np.trunc(x + np.where(x >= 0, 0.5, -0.5)).astype(np.int16)
    else:
        raise NotImplementedError(
            f"wav_decode: format {audio_fmt} / {bits}-bit not supported"
        )
    if channels and channels > 1:
        samples = samples[::channels]
    return samples, rate


def wav_resample_nearest(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Nearest-neighbor (zero-order hold) resample — same index rule as
    the byte-level fake path so both modes agree on sample selection:
    out[i] = in[(i*src)//dst], n_out = ceil(n*dst/src)."""
    n_out = (len(samples) * dst_rate + src_rate - 1) // src_rate
    idx = (np.arange(n_out) * src_rate) // dst_rate
    return samples[idx]


# ---------------------------------------------------------------------------
# AVI (uncompressed DIB frames)
# ---------------------------------------------------------------------------


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


_MJPG = struct.unpack("<I", b"MJPG")[0]


def avi_encode(
    frames: np.ndarray, fps: int = 10, codec: str = "DIB", quality: int = 95
) -> bytes:
    """Encode (N, H, W, 3) RGB uint8 frames into an AVI (RIFF): 'hdrl'
    with avih + one video stream, 'movi' with one frame chunk per
    input frame, and an idx1 index.

    codec='DIB' (default): uncompressed '00db' DIB frames (bottom-up
    BGR rows padded to 4 bytes, biCompression=0).  codec='MJPG'
    (round 8): Motion JPEG — each frame is an independent baseline
    JPEG in a '00dc' chunk (biCompression='MJPG'), the simplest REAL
    compressed-video layout and the one the in-repo JPEG codec makes
    honest; ``quality`` applies per frame."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("avi_encode: frames must be (N, H, W, 3) uint8")
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"avi_encode: codec must be 'DIB' or 'MJPG', got {codec!r}")
    n, h, w, _ = frames.shape
    row_bytes = (w * 3 + 3) & ~3

    def dib(frame: np.ndarray) -> bytes:
        bgr = frame[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
        if row_bytes == w * 3:
            return bgr.tobytes()
        padded = np.zeros((h, row_bytes), dtype=np.uint8)
        padded[:, : w * 3] = bgr.reshape(h, w * 3)
        return padded.tobytes()

    if codec == "DIB":
        payloads = [dib(frames[i]) for i in range(n)]
        chunk_id, handler, bi_comp = b"00db", b"DIB ", 0
    else:
        from deepicedrain_spark.functions.jpeg import jpeg_encode

        payloads = [jpeg_encode(frames[i], quality=quality) for i in range(n)]
        chunk_id, handler, bi_comp = b"00dc", b"MJPG", _MJPG
    frame_size = max((len(p) for p in payloads), default=row_bytes * h)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        frame_size * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # flags: AVIF_HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", handler, 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, bi_comp, row_bytes * h, 0, 0, 0, 0
    )
    strl = _riff_chunk(
        b"LIST", b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    entries = []
    for p in payloads:
        entries.append((len(movi_body), len(p)))
        movi_body += _riff_chunk(chunk_id, p)
    movi = _riff_chunk(b"LIST", movi_body)
    idx = b"".join(
        chunk_id + struct.pack("<III", 0x10, off, ln) for off, ln in entries
    )
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", idx)
    return _riff_chunk(b"RIFF", body)


def avi_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an AVI back to ((N, H, W, 3) RGB uint8, fps).  Walks the
    RIFF tree: avih for dimensions, movi '00db'/'00dc' chunks for
    frames.  biCompression=0 reads DIB frames; 'MJPG' (round 8)
    decodes each frame with the in-repo baseline JPEG codec.  Other
    codecs (H.264, ...) remain a NotImplementedError seam."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("avi: not a RIFF/AVI file")

    def chunks(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            yield fourcc, pos + 8, size
            pos += 8 + size + (size % 2)

    w = h = n_frames = 0
    usec_per_frame = 100_000
    compression = 0
    frames_raw: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, n_frames, usec_per_frame, compression
        for fourcc, dpos, size in chunks(data, pos, end):
            if fourcc == b"LIST":
                walk(dpos + 4, dpos + size)
            elif fourcc == b"avih":
                usec_per_frame, _mbps, _pad, _flags, n_frames = struct.unpack_from(
                    "<IIIII", data, dpos
                )
                w, h = struct.unpack_from("<II", data, dpos + 32)
            elif fourcc == b"strf" and size >= 40:
                compression = struct.unpack_from("<I", data, dpos + 16)[0]
            elif fourcc in (b"00db", b"00dc"):
                frames_raw.append(data[dpos : dpos + size])

    walk(12, len(data))
    if not (w and h):
        raise ValueError("avi: missing avih header")
    fps = max(1, round(1_000_000 / usec_per_frame)) if usec_per_frame else 1
    if compression == _MJPG:
        from deepicedrain_spark.functions.jpeg import jpeg_decode

        out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
        for i, raw in enumerate(frames_raw):
            px = jpeg_decode(bytes(raw))
            if px.ndim == 2:  # grayscale frame: replicate channels
                px = np.repeat(px[:, :, None], 3, axis=2)
            if px.shape[:2] != (h, w):
                raise ValueError("avi: MJPG frame dimensions disagree with avih")
            out[i] = px
        return out, fps
    if compression != 0:
        raise NotImplementedError(
            f"avi: compressed video codec 0x{compression:08x} needs a real "
            "codec (ffmpeg seam; MJPG and DIB are supported in-repo)"
        )
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        rows = np.frombuffer(raw[: row_bytes * h], dtype=np.uint8).reshape(h, row_bytes)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        out[i] = bgr[::-1, :, ::-1]
    return out, fps
