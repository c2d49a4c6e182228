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

Decoders accept anything the encoders emit plus the common cases a
real corpus would hold (PNG: bit depth 8, color types 0/2/4/6 — the
stats path aggregates over ALL decoded channels incl. alpha; all five
filter types. WAV: PCM16 mono or interleaved multichannel, first
channel returned).
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


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes to (H, W) uint8 (gray) or (H, W, C) uint8.
    Bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA), no interlace."""
    if data[:8] != _PNG_SIG:
        raise ValueError("png_decode: bad PNG signature")
    pos = 8
    idat = b""
    w = h = None
    color_type = None
    while pos < len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        pos += 12 + clen
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"png_decode: bit depth {depth}")
            if interlace:
                raise NotImplementedError("png_decode: interlaced PNG")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if nch is None:
        raise NotImplementedError(f"png_decode: color type {color_type}")
    raw = zlib.decompress(idat)
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("png_decode: scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for row in range(h):
        ftype = raw[row * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up
            cur = line + prev  # uint8 wraps mod 256 — the spec's arithmetic
        elif ftype in (1, 3, 4):  # sub / average / paeth: left-dependent
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
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
    if nch == 1:
        return out.reshape(h, w)
    return out.reshape(h, w, nch)


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
    """(first-channel int16 samples, sample rate) from a PCM16 WAV."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("wav_decode: not a RIFF/WAVE file")
    pos = 12
    rate = channels = None
    samples = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("wav_decode: only PCM16 supported")
        elif ctype == b"data":
            samples = np.frombuffer(body, dtype="<i2")
    if rate is None or samples is None:
        raise ValueError("wav_decode: missing fmt/data chunk")
    if channels and channels > 1:
        samples = samples[::channels]
    return samples.astype(np.int16), rate


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


def avi_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (N, H, W, 3) RGB uint8 frames into an uncompressed AVI
    (RIFF): 'hdrl' with avih + one video stream (strh 'vids'/'DIB ',
    strf = BITMAPINFOHEADER, biCompression=0), 'movi' with one '00db'
    DIB frame per input frame (bottom-up row order, BGR, rows padded
    to 4 bytes — the BMP layout), and an idx1 index."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("avi_encode: frames must be (N, H, W, 3) uint8")
    n, h, w, _ = frames.shape
    row_bytes = (w * 3 + 3) & ~3
    frame_size = row_bytes * h

    def dib(frame: np.ndarray) -> bytes:
        bgr = frame[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
        if row_bytes == w * 3:
            return bgr.tobytes()
        padded = np.zeros((h, row_bytes), dtype=np.uint8)
        padded[:, : w * 3] = bgr.reshape(h, w * 3)
        return padded.tobytes()

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
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    strl = _riff_chunk(
        b"LIST", b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    offsets = []
    for i in range(n):
        offsets.append(len(movi_body))
        movi_body += _riff_chunk(b"00db", dib(frames[i]))
    movi = _riff_chunk(b"LIST", movi_body)
    idx = b"".join(
        b"00db" + struct.pack("<III", 0x10, off, frame_size) for off in offsets
    )
    body = b"AVI " + hdrl + movi + _riff_chunk(b"idx1", idx)
    return _riff_chunk(b"RIFF", body)


def avi_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an uncompressed AVI back to ((N, H, W, 3) RGB uint8, fps).
    Walks the RIFF tree: avih for dimensions, movi '00db'/'00dc'
    chunks for frames. Rejects compressed streams."""
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
    if compression != 0:
        raise NotImplementedError(
            "avi: compressed video streams need a real codec (ffmpeg seam)"
        )
    if not (w and h):
        raise ValueError("avi: missing avih header")
    row_bytes = (w * 3 + 3) & ~3
    out = np.empty((len(frames_raw), h, w, 3), dtype=np.uint8)
    for i, raw in enumerate(frames_raw):
        rows = np.frombuffer(raw[: row_bytes * h], dtype=np.uint8).reshape(h, row_bytes)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        out[i] = bgr[::-1, :, ::-1]
    fps = max(1, round(1_000_000 / usec_per_frame)) if usec_per_frame else 1
    return out, fps
