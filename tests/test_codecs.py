"""Pure-stdlib PNG/WAV codecs and the multimodal mode='real' paths
they unlock (previously a NotImplementedError seam — VERDICT r2
missing-item #2). Filter-type coverage matters: our encoder only emits
filter 0, so decode of filters 1-4 is exercised with hand-built
scanlines (what a foreign PNG would contain)."""

import struct
import zlib

import numpy as np
import pytest

from deepicedrain_spark.functions import codecs as C


def test_png_gray_roundtrip():
    px = (np.arange(240) % 256).astype(np.uint8).reshape(12, 20)
    data = C.png_encode(px)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    np.testing.assert_array_equal(C.png_decode(data), px)


def test_png_rgb_roundtrip():
    rgb = (np.arange(12 * 20 * 3) % 256).astype(np.uint8).reshape(12, 20, 3)
    np.testing.assert_array_equal(C.png_decode(C.png_encode(rgb)), rgb)


def _encode_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Reference-side encoder emitting chosen filter types per row."""
    h, w = img.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.uint8)
    for r, ft in zip(range(h), ftypes):
        cur = img[r]
        raw.append(ft)
        enc = np.zeros(w, np.uint8)
        for i in range(w):
            a = int(cur[i - 1]) if i >= 1 else 0
            b = int(prev[i])
            c = int(prev[i - 1]) if i >= 1 else 0
            x = int(cur[i])
            if ft == 0:
                enc[i] = x
            elif ft == 1:
                enc[i] = (x - a) & 0xFF
            elif ft == 2:
                enc[i] = (x - b) & 0xFF
            elif ft == 3:
                enc[i] = (x - (a + b) // 2) & 0xFF
            else:
                enc[i] = (x - C._paeth(a, b, c)) & 0xFF
        raw += bytes(enc)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        C._PNG_SIG
        + C._chunk(b"IHDR", ihdr)
        + C._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + C._chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    img = np.random.RandomState(7).randint(0, 256, (5, 9), dtype=np.uint8)
    data = _encode_with_filters(img, [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(C.png_decode(data), img)


def test_png_resize_nearest():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = C.png_resize_nearest(px, 2, 2)
    np.testing.assert_array_equal(out, [[0, 2], [8, 10]])
    up = C.png_resize_nearest(px, 8, 8)
    assert up.shape == (8, 8) and up[0, 0] == 0 and up[7, 7] == 15


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        C.png_decode(b"not a png at all----")


def test_wav_roundtrip_and_resample():
    s = ((np.arange(777) * 13) % 4001 - 2000).astype(np.int16)
    data = C.wav_encode(s, 16_000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    out, rate = C.wav_decode(data)
    assert rate == 16_000
    np.testing.assert_array_equal(out, s)
    r = C.wav_resample_nearest(s, 16_000, 8_000)
    assert len(r) == (777 * 8_000 + 15_999) // 16_000
    np.testing.assert_array_equal(r, s[(np.arange(len(r)) * 16_000) // 8_000])


def test_wav_multichannel_takes_first():
    inter = np.array([1, -1, 2, -2, 3, -3], dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(inter)) + inter
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = C.wav_decode(data)
    np.testing.assert_array_equal(out, [1, 2, 3])


# ---------------------------------------------------------------------------
# Spark-side real-mode operators
# ---------------------------------------------------------------------------


def test_decode_image_features_real(spark):
    from deepicedrain_spark.operators.multimodal import (
        attach_png_media,
        decode_image_features,
    )

    ids = spark.createDataFrame([(i,) for i in (0, 7, 123)], "doc_id long")
    media = attach_png_media(ids, "doc_id")
    feats = {r["media_id"]: r for r in decode_image_features(media, mode="real").collect()}
    for i in (0, 7, 123):
        w, h = i % 16 + 8, i % 12 + 6
        px = (i * 31 + np.arange(w * h) * 7) % 256
        r = feats[str(i)]
        assert r["n_bytes"] == w * h
        assert r["max_byte"] == int(px.max())
        assert r["mean_byte"] == pytest.approx(px.mean())


def test_resize_image_real_roundtrip(spark):
    from deepicedrain_spark.operators.multimodal import attach_png_media, resize_image
    from deepicedrain_spark.functions.codecs import png_decode

    ids = spark.createDataFrame([(5,)], "doc_id long")
    media = attach_png_media(ids, "doc_id")
    out = resize_image(media, width=4, height=3, mode="real").collect()[0]
    px = png_decode(bytes(out["payload"]))
    assert px.shape == (3, 4)
    w, h = 5 % 16 + 8, 5 % 12 + 6
    orig = ((5 * 31 + np.arange(w * h) * 7) % 256).astype(np.uint8).reshape(h, w)
    np.testing.assert_array_equal(px, C.png_resize_nearest(orig, 4, 3))


def test_resample_audio_real(spark):
    from deepicedrain_spark.operators.multimodal import (
        attach_wav_media,
        decode_audio_stats,
        resample_audio,
    )

    ids = spark.createDataFrame([(42,)], "doc_id long")
    media = attach_wav_media(ids, "doc_id", rate=16_000)
    res = resample_audio(media, src_rate=16_000, dst_rate=8_000, mode="real")
    stats = decode_audio_stats(res).collect()[0]
    n = 42 % 400 + 100
    s = ((42 * 13 + np.arange(n) * 5) % 4001) - 2000
    expect = s[::2]
    assert stats["n_samples"] == len(expect)
    assert stats["sum_sample"] == int(expect.sum())
    assert stats["max_sample"] == int(expect.max())
    assert stats["sample_rate"] == 8_000


def test_video_seam_still_raises(spark):
    from deepicedrain_spark.operators.multimodal import attach_fake_media, sample_frames

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    media = attach_fake_media(docs, "doc_id", "text")
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        sample_frames(media, mode="real").collect()


def test_avi_roundtrip_shapes_and_values():
    """Uncompressed AVI: encode->decode is the identity across frame
    counts, odd widths (4-byte row padding), and 1x1 frames; fps
    survives the usec-per-frame header round trip."""
    import numpy as np

    from deepicedrain_spark.functions.codecs import avi_decode, avi_encode

    rng = np.random.RandomState(7)
    for n, h, w, fps in [(1, 4, 4, 10), (6, 12, 16, 30), (3, 7, 5, 12), (2, 1, 1, 1)]:
        frames = rng.randint(0, 256, (n, h, w, 3), dtype=np.uint8)
        data = avi_encode(frames, fps=fps)
        back, got_fps = avi_decode(data)
        assert got_fps == fps
        assert back.shape == frames.shape
        assert np.array_equal(back, frames)


def test_avi_rejects_garbage_and_compressed():
    import struct

    import numpy as np
    import pytest

    from deepicedrain_spark.functions.codecs import avi_decode, avi_encode

    with pytest.raises(ValueError):
        avi_decode(b"not an avi")
    # flip biCompression in the strf header -> must refuse, not garble
    data = bytearray(avi_encode(np.zeros((1, 2, 2, 3), dtype=np.uint8)))
    pos = data.find(b"strf")
    struct.pack_into("<I", data, pos + 8 + 16, 0x34363248)  # 'H264'
    with pytest.raises(NotImplementedError):
        avi_decode(bytes(data))


def test_png_alpha_roundtrip_and_resize():
    """Review finding r4: png_encode accepts the 2-/4-channel layouts
    png_decode produces for color types 4/6, so the real-mode
    decode->resize->encode path survives alpha images."""
    import numpy as np

    from deepicedrain_spark.functions.codecs import (
        png_decode,
        png_encode,
        png_resize_nearest,
    )

    rng = np.random.RandomState(11)
    for shape in [(6, 5, 2), (6, 5, 4)]:
        a = rng.randint(0, 256, shape, dtype=np.uint8)
        back = png_decode(png_encode(a))
        assert back.shape == a.shape and np.array_equal(back, a)
        r = png_resize_nearest(back, 3, 4)
        assert np.array_equal(png_decode(png_encode(r)), r)


# --- round 8: the former PNG seams (palette, sub-byte, 16-bit, Adam7) --


def _filter_bytes(rows: np.ndarray, ftypes, bpp: int) -> bytes:
    """Reference-side byte filter over (h, stride) raw scanlines with
    the left neighbor bpp bytes back — the generalization a foreign
    encoder applies at any bit depth."""
    h, stride = rows.shape
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for r, ft in zip(range(h), ftypes):
        cur = rows[r]
        raw.append(ft)
        for i in range(stride):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            x = int(cur[i])
            if ft == 0:
                raw.append(x)
            elif ft == 1:
                raw.append((x - a) & 0xFF)
            elif ft == 2:
                raw.append((x - b) & 0xFF)
            elif ft == 3:
                raw.append((x - (a + b) // 2) & 0xFF)
            else:
                raw.append((x - C._paeth(a, b, c)) & 0xFF)
        prev = cur
    return bytes(raw)


def _png_from(w, h, depth, color_type, payload: bytes, extra=b"", interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        C._PNG_SIG
        + C._chunk(b"IHDR", ihdr)
        + extra
        + C._chunk(b"IDAT", zlib.compress(payload))
        + C._chunk(b"IEND", b"")
    )


def test_png_palette_decode_with_and_without_trns():
    rng = np.random.RandomState(3)
    plte = rng.randint(0, 256, (6, 3), dtype=np.uint8)
    idx = rng.randint(0, 6, (4, 7), dtype=np.uint8)
    raw = _filter_bytes(idx, [0, 1, 2, 4], bpp=1)
    data = _png_from(7, 4, 8, 3, raw, extra=C._chunk(b"PLTE", plte.tobytes()))
    np.testing.assert_array_equal(C.png_decode(data), plte[idx])
    trns = np.array([255, 0, 128], dtype=np.uint8)  # shorter than palette
    data2 = _png_from(
        7, 4, 8, 3, raw,
        extra=C._chunk(b"PLTE", plte.tobytes()) + C._chunk(b"tRNS", trns.tobytes()),
    )
    out = C.png_decode(data2)
    assert out.shape == (4, 7, 4)
    np.testing.assert_array_equal(out[:, :, :3], plte[idx])
    alpha_lut = np.array([255, 0, 128, 255, 255, 255], dtype=np.uint8)
    np.testing.assert_array_equal(out[:, :, 3], alpha_lut[idx])


def test_png_palette_4bit_packing():
    plte = np.array([[i * 16, 255 - i * 16, i] for i in range(16)], dtype=np.uint8)
    idx = np.array([[0, 15, 3, 9, 2], [7, 1, 14, 4, 11]], dtype=np.uint8)
    # two 4-bit indexes per byte, high nibble first; odd width pads
    packed = np.zeros((2, 3), dtype=np.uint8)
    for r in range(2):
        for i in range(5):
            byte, hi = divmod(i, 2)
            packed[r, byte] |= idx[r, i] << (4 if hi == 0 else 0)
    raw = _filter_bytes(packed, [0, 2], bpp=1)
    data = _png_from(5, 2, 4, 3, raw, extra=C._chunk(b"PLTE", plte.tobytes()))
    np.testing.assert_array_equal(C.png_decode(data), plte[idx])


def test_png_gray_1bit_scales_to_full_range():
    bits = np.array([[0b10110000], [0b01001000]], dtype=np.uint8)  # 5 cols used
    raw = _filter_bytes(bits, [0, 0], bpp=1)
    data = _png_from(5, 2, 1, 0, raw)
    np.testing.assert_array_equal(
        C.png_decode(data),
        np.array([[255, 0, 255, 255, 0], [0, 255, 0, 0, 255]], dtype=np.uint8),
    )


def test_png_gray16_and_rgb16_all_filters():
    rng = np.random.RandomState(11)
    g16 = rng.randint(0, 65536, (5, 4), dtype=np.uint16)
    rows = g16.astype(">u2").view(np.uint8).reshape(5, 8)
    data = _png_from(4, 5, 16, 0, _filter_bytes(rows, [0, 1, 2, 3, 4], bpp=2))
    out = C.png_decode(data)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, g16)
    rgb16 = rng.randint(0, 65536, (3, 4, 3), dtype=np.uint16)
    rows = rgb16.reshape(3, -1).astype(">u2").view(np.uint8).reshape(3, 24)
    data = _png_from(4, 3, 16, 2, _filter_bytes(rows, [4, 3, 1], bpp=6))
    np.testing.assert_array_equal(C.png_decode(data), rgb16)


def _adam7_payload(img: np.ndarray, depth=8, nch=3) -> bytes:
    """Interlaced payload: each pass extracted, byte-filtered (type 0)."""
    h, w = img.shape[:2]
    payload = b""
    for x0, y0, dx, dy in C._ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        rows = sub.reshape(ph, pw * nch)
        payload += _filter_bytes(rows, [0] * ph, bpp=max(1, nch * depth // 8))
    return payload


def test_png_adam7_rgb_roundtrip():
    rng = np.random.RandomState(23)
    img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    data = _png_from(8, 8, 8, 2, _adam7_payload(img), interlace=1)
    np.testing.assert_array_equal(C.png_decode(data), img)


def test_png_adam7_odd_dims_with_empty_passes():
    rng = np.random.RandomState(29)
    img = rng.randint(0, 256, (3, 5, 3), dtype=np.uint8)  # pass 2 empty
    data = _png_from(5, 3, 8, 2, _adam7_payload(img), interlace=1)
    np.testing.assert_array_equal(C.png_decode(data), img)
    tall = rng.randint(0, 256, (9, 1, 3), dtype=np.uint8)
    data = _png_from(1, 9, 8, 2, _adam7_payload(tall), interlace=1)
    np.testing.assert_array_equal(C.png_decode(data), tall)


# --- round 8: the former WAV seams (PCM8/24/32, IEEE float) ------------


def _wav_bytes(fmt: int, bits: int, payload: bytes, rate=8000, channels=1) -> bytes:
    block = channels * bits // 8
    fmtc = struct.pack("<HHIIHH", fmt, channels, rate, rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_pcm8_unsigned():
    s, rate = C.wav_decode(_wav_bytes(1, 8, bytes([0, 128, 255, 64])))
    assert rate == 8000
    np.testing.assert_array_equal(
        s, np.array([-32768, 0, 32512, -16384], dtype=np.int16)
    )


def test_wav_pcm24_top_bits():
    vals = [0x123456, 0xFFFFFF, 0x800000, 0x7FFFFF]
    payload = b"".join(v.to_bytes(3, "little") for v in vals)
    s, _ = C.wav_decode(_wav_bytes(1, 24, payload))
    np.testing.assert_array_equal(
        s, np.array([0x1234, -1, -32768, 0x7FFF], dtype=np.int16)
    )


def test_wav_pcm32_and_float32():
    i32 = np.array([1 << 16, -(1 << 16), 0x7FFFFFFF, -0x80000000], dtype="<i4")
    s, _ = C.wav_decode(_wav_bytes(1, 32, i32.tobytes()))
    np.testing.assert_array_equal(s, np.array([1, -1, 32767, -32768], dtype=np.int16))
    f = np.array([0.0, 1.0, -1.0, 0.5, -0.25, 2.0, -3.0], dtype="<f4")
    s, _ = C.wav_decode(_wav_bytes(3, 32, f.tobytes()))
    np.testing.assert_array_equal(
        s, np.array([0, 32767, -32767, 16384, -8192, 32767, -32767], dtype=np.int16)
    )


def test_wav_adpcm_still_a_seam():
    with pytest.raises(NotImplementedError):
        C.wav_decode(_wav_bytes(2, 4, b"\x00\x00"))


# --- round 8: baseline JPEG codec --------------------------------------


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def _smooth(h, w):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 200, h)
    return np.clip(np.add.outer(y, x) / 2, 0, 255).astype(np.uint8)


def test_jpeg_gray_roundtrip_quality_ladder():
    from deepicedrain_spark.functions.jpeg import jpeg_decode, jpeg_encode

    img = _smooth(48, 48)
    last = 0.0
    for q in (50, 85, 95):
        out = jpeg_decode(jpeg_encode(img, quality=q))
        assert out.shape == img.shape and out.dtype == np.uint8
        p = _psnr(img, out)
        assert p > 35.0
        assert p >= last  # higher quality must not get worse
        last = p


def test_jpeg_rgb_444_and_420():
    from deepicedrain_spark.functions.jpeg import jpeg_decode, jpeg_encode

    g = _smooth(40, 24)
    rgb = np.stack([g, g[::-1], 255 - g], axis=2)
    out = jpeg_decode(jpeg_encode(rgb, quality=90))
    assert out.shape == rgb.shape
    assert _psnr(rgb, out) > 35.0
    out420 = jpeg_decode(jpeg_encode(rgb, quality=90, subsample=True))
    assert out420.shape == rgb.shape
    assert _psnr(rgb, out420) > 30.0


def test_jpeg_odd_dimensions():
    from deepicedrain_spark.functions.jpeg import jpeg_decode, jpeg_encode

    g = _smooth(13, 17)
    rgb = np.stack([g, g, g], axis=2)
    for sub in (False, True):
        out = jpeg_decode(jpeg_encode(rgb, quality=95, subsample=sub))
        assert out.shape == (13, 17, 3)
        assert _psnr(rgb, out) > 35.0


def test_jpeg_uniform_blocks_exact_at_q100():
    """Uniform 8x8 blocks at quality 100 (all quantizers 1) put all
    energy in the integer DC coefficient — decode is EXACT, the
    property the multimodal_jpeg_decode oracle relies on."""
    from deepicedrain_spark.functions.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(17)
    vals = rng.randint(0, 256, (3, 4), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    np.testing.assert_array_equal(jpeg_decode(jpeg_encode(img, quality=100)), img)


def test_jpeg_restart_markers_roundtrip():
    from deepicedrain_spark.functions.jpeg import jpeg_decode, jpeg_encode

    img = _smooth(32, 48)  # 4x6 = 24 MCUs
    plain = jpeg_decode(jpeg_encode(img, quality=85))
    data = jpeg_encode(img, quality=85, restart_interval=3)
    assert b"\xff\xdd" in data  # DRI
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    np.testing.assert_array_equal(jpeg_decode(data), plain)


def test_jpeg_progressive_matches_baseline_decode():
    """Progressive encode carries the SAME quantized coefficients as
    baseline, split across DC/AC first+refinement scans — so decoding
    it must be bit-identical to decoding the baseline encode."""
    from deepicedrain_spark.functions.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    for shape, sub in [((16, 16), False), ((24, 33), False), ((17, 19), True)]:
        g = _smooth(*shape)
        rgb = np.stack([g, np.roll(g, 3, axis=1), 255 - g], axis=2)
        for img in (g, rgb):
            if sub and img.ndim == 2:
                continue
            base = jpeg_decode(jpeg_encode(img, quality=80, subsample=sub))
            prog_bytes = jpeg_encode_progressive(img, quality=80, subsample=sub)
            assert b"\xff\xc2" in prog_bytes  # really SOF2
            prog = jpeg_decode(prog_bytes)
            np.testing.assert_array_equal(prog, base)


def test_jpeg_progressive_eobrun_spans_blocks():
    """A mostly-uniform image makes whole blocks AC-empty, forcing
    multi-block EOB runs in both the first and refinement AC scans."""
    from deepicedrain_spark.functions.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    img = np.full((48, 48), 100, dtype=np.uint8)
    img[20, 20] = 240  # one busy block among many empty ones
    base = jpeg_decode(jpeg_encode(img, quality=85))
    prog = jpeg_decode(jpeg_encode_progressive(img, quality=85))
    np.testing.assert_array_equal(prog, base)


def test_jpeg_16bit_quantization_tables():
    """Rewrite our own file's 8-bit DQT segments into the 16-bit (Pq=1)
    form with identical values — decode must be bit-identical."""
    import struct as _s

    from deepicedrain_spark.functions.jpeg import jpeg_decode, jpeg_encode

    g = _smooth(24, 17)
    rgb = np.stack([g, 255 - g, np.roll(g, 2, axis=0)], axis=2)
    data = jpeg_encode(rgb, quality=70, subsample=True)
    out = bytearray()
    pos = 0
    while pos < len(data):
        if data[pos] == 0xFF and data[pos + 1] == 0xDB:
            (seglen,) = _s.unpack_from(">H", data, pos + 2)
            body = data[pos + 4 : pos + 2 + seglen]
            tq = body[0] & 0xF
            vals = body[1:65]
            wide = bytes([(1 << 4) | tq]) + b"".join(
                _s.pack(">H", v) for v in vals
            )
            out += bytes([0xFF, 0xDB]) + _s.pack(">H", len(wide) + 2) + wide
            pos += 2 + seglen
        else:
            out.append(data[pos])
            pos += 1
    assert bytes(out) != data
    np.testing.assert_array_equal(jpeg_decode(bytes(out)), jpeg_decode(data))


def test_jpeg_progressive_libjpeg_style_scan_script():
    """libjpeg's default progressive script uses spectral BANDS and a
    two-level successive-approximation ladder — shapes the default
    four-phase script never emits.  Decode must still match baseline."""
    from deepicedrain_spark.functions.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(11)
    g = _smooth(24, 24)
    rgb = np.stack([g, np.roll(g, 5, axis=0), rng.integers(0, 256, (24, 24), dtype=np.uint8)], axis=2)
    # the jcparam.c default scan script shape for 3-component images
    script = [
        (None, 0, 0, 0, 1),       # DC first, Al=1
        ([0], 1, 5, 0, 2),        # luma AC band 1-5 first, Al=2
        ([2], 1, 63, 0, 1),       # Cr full band
        ([1], 1, 63, 0, 1),       # Cb full band
        ([0], 6, 63, 0, 2),       # luma AC band 6-63 first, Al=2
        ([0], 1, 63, 2, 1),       # luma refine Al 2->1 (full band)
        (None, 0, 0, 1, 0),       # DC refine
        ([2], 1, 63, 1, 0),       # Cr refine
        ([1], 1, 63, 1, 0),       # Cb refine
        ([0], 1, 63, 1, 0),       # luma refine Al 1->0
    ]
    for img in (rgb, rng.integers(0, 256, (19, 27, 3), dtype=np.uint8)):
        base = jpeg_decode(jpeg_encode(img, quality=75))
        prog = jpeg_decode(jpeg_encode_progressive(img, quality=75, scans=script))
        np.testing.assert_array_equal(prog, base)
    # gray variant with banded luma + 2-level ladder
    gscript = [
        (None, 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        (None, 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
    ]
    img = rng.integers(0, 256, (30, 22), dtype=np.uint8)
    base = jpeg_decode(jpeg_encode(img, quality=60))
    prog = jpeg_decode(jpeg_encode_progressive(img, quality=60, scans=gscript))
    np.testing.assert_array_equal(prog, base)


def test_jpeg_progressive_random_images_property():
    from deepicedrain_spark.functions.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.default_rng(7)
    for trial in range(6):
        h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        if trial % 2:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        else:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        sub = img.ndim == 3 and trial % 3 == 0
        q = int(rng.integers(50, 100))
        base = jpeg_decode(jpeg_encode(img, quality=q, subsample=sub))
        prog = jpeg_decode(jpeg_encode_progressive(img, quality=q, subsample=sub))
        np.testing.assert_array_equal(prog, base)


def test_image_decode_dispatches_by_signature():
    from deepicedrain_spark.functions.codecs import image_decode
    from deepicedrain_spark.functions.jpeg import jpeg_encode

    g = _smooth(16, 16)
    np.testing.assert_array_equal(image_decode(C.png_encode(g)), g)
    assert image_decode(jpeg_encode(g, quality=90)).shape == g.shape
    with pytest.raises(ValueError):
        image_decode(b"GIF89a not supported")


# --- round 8: Motion JPEG AVI -------------------------------------------


def test_avi_mjpeg_roundtrip_and_exactness():
    from deepicedrain_spark.functions.codecs import avi_decode, avi_encode

    g = _smooth(24, 32)
    frames = np.stack(
        [np.stack([g, np.roll(g, i * 3, axis=1), 255 - g], axis=2) for i in range(4)]
    )
    data = avi_encode(frames, fps=5, codec="MJPG", quality=90)
    assert b"MJPG" in data and b"00dc" in data
    out, fps = avi_decode(data)
    assert fps == 5 and out.shape == frames.shape
    assert _psnr(frames, out) > 33.0
    # uniform-block gray-as-RGB frames at q100 are EXACT (the
    # multimodal_mjpeg_frames oracle property)
    vals = np.arange(6, dtype=np.uint8).reshape(2, 3) * 40
    f0 = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:, :, None].repeat(3, axis=2)
    exact = np.stack([f0, 255 - f0])
    out, _ = avi_decode(avi_encode(exact, codec="MJPG", quality=100))
    np.testing.assert_array_equal(out, exact)


def test_avi_unknown_codec_still_a_seam():
    from deepicedrain_spark.functions.codecs import avi_decode, avi_encode
    import struct as _s

    frames = np.zeros((1, 8, 8, 3), dtype=np.uint8)
    data = bytearray(avi_encode(frames, codec="MJPG"))
    i = data.index(b"strf") + 8 + 16  # biCompression field
    data[i : i + 4] = _s.pack("<I", _s.unpack("<I", b"H264")[0])
    with pytest.raises(NotImplementedError, match="avi: compressed video codec"):
        avi_decode(bytes(data))


@pytest.mark.parametrize(
    "path",
    [
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "site-packages/IPython/core/tests/2x2.jpg",
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "test/test_email/data/python.jpg",
    ],
)
def test_jpeg_decodes_foreign_libjpeg_files(path):
    """Cross-validation against files produced by a REAL encoder
    (libjpeg, shipped inside CPython/IPython test data): Annex-K
    typical Huffman tables, subsampled chroma — none of which our own
    encoder emits, so decode success + sane geometry is independent
    evidence. Skipped when the host provides no such files."""
    import os

    from deepicedrain_spark.functions.jpeg import jpeg_decode

    if not os.path.exists(path):
        pytest.skip("no foreign libjpeg sample on this host")
    out = jpeg_decode(open(path, "rb").read())
    assert out.dtype == np.uint8
    assert out.shape[0] >= 2 and out.shape[1] >= 2


def test_spread_adapts_to_tiny_cheap_inputs(spark):
    """Adaptive _spread (round 10): a cheap-codec attach over a tiny id
    frame must NOT fan out to defaultParallelism tasks; a heavy-codec
    attach (min_rows_per_task=None) must keep the full spread."""
    from deepicedrain_spark.operators import multimodal as mm

    ids = spark.range(40).withColumnRenamed("id", "doc_id").coalesce(1)
    wav = mm.attach_wav_media(ids, "doc_id")          # knob 512 -> 1 task
    assert wav.rdd.getNumPartitions() == 1
    mj = mm.attach_mjpeg_media(ids, "doc_id")         # heavy -> full spread
    assert mj.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # mid-size cheap input sizes proportionally
    ids2 = spark.range(1200).withColumnRenamed("id", "doc_id").coalesce(1)
    wav2 = mm.attach_wav_media(ids2, "doc_id")        # ceil(1200/512) = 3
    assert wav2.rdd.getNumPartitions() == 3
