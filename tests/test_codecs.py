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
