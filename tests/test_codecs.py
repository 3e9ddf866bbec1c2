"""Real-codec tests: BMP / WAV / Y4M encode-decode round trips, a
hand-assembled byte fixture per format (so the decoder is checked against
the SPEC, not against our own encoder), and the Spark decode dispatcher
over mixed real payloads."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from barberini_analytics_spark.multimodal import codecs as C
from barberini_analytics_spark.multimodal import media as M


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def test_bmp_hand_assembled_fixture():
    """A 2x2 24-bit BMP built by hand from the file-format spec: rows
    bottom-up, BGR order, rows padded to 4 bytes (2px * 3B = 6 → pad 2)."""
    #                 top row: red, green   bottom row: blue, white
    bottom_row = bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00"
    top_row = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    pixel_data = bottom_row + top_row       # bottom-up
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    d = C.decode_bmp(header + info + pixel_data)
    assert (d["width"], d["height"]) == (2, 2)
    assert d["pixels"][0, 0].tolist() == [255, 0, 0]      # top-left red
    assert d["pixels"][0, 1].tolist() == [0, 255, 0]      # top-right green
    assert d["pixels"][1, 0].tolist() == [0, 0, 255]      # bottom-left blue
    assert d["pixels"][1, 1].tolist() == [255, 255, 255]  # bottom-right


def test_bmp_roundtrip_with_row_padding():
    rng = np.random.default_rng(42)
    for w, h in [(3, 5), (4, 4), (7, 2), (1, 1)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        d = C.decode_bmp(C.encode_bmp(img))
        assert (d["width"], d["height"]) == (w, h)
        assert np.array_equal(d["pixels"], img)
        luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2]).mean()
        assert d["mean_luma"] == pytest.approx(luma)


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        C.decode_bmp(b"PNG..nope")


# ---------------------------------------------------------------------------
# WAV (encoder = stdlib wave, decoder = hand-rolled RIFF walk —
# independent implementations)
# ---------------------------------------------------------------------------

def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32768, size=400, dtype=np.int16)
    d = C.decode_wav(C.encode_wav(mono, sample_rate=8000))
    assert (d["n_channels"], d["sample_rate"], d["n_samples"]) == (1, 8000, 400)
    assert np.array_equal(d["samples"], mono)
    assert d["rms"] == pytest.approx(
        float(np.sqrt(np.mean(mono.astype(np.float64) ** 2))))

    stereo = rng.integers(-32768, 32768, size=(300, 2), dtype=np.int16)
    d2 = C.decode_wav(C.encode_wav(stereo.reshape(-1), sample_rate=44100,
                                   n_channels=2))
    assert (d2["n_channels"], d2["sample_rate"], d2["n_samples"]) == (2, 44100, 300)


def test_wav_hand_assembled_fixture():
    """Minimal RIFF/WAVE PCM file assembled from the spec: 2 samples,
    16-bit mono 1 kHz."""
    data = struct.pack("<hh", 1000, -1000)
    fmt = struct.pack("<HHIIHH", 1, 1, 1000, 2000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    d = C.decode_wav(wav)
    assert d["n_samples"] == 2 and d["samples"].tolist() == [1000, -1000]


def test_wav_rejects_compressed():
    fmt = struct.pack("<HHIIHH", 85, 1, 1000, 2000, 2, 16)  # MP3-in-WAV
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", 0)
    with pytest.raises(ValueError):
        C.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


# ---------------------------------------------------------------------------
# Y4M
# ---------------------------------------------------------------------------

def test_y4m_hand_assembled_fixture():
    """YUV4MPEG2 stream written by hand: 2x2 C420, two frames."""
    f0 = bytes([10, 20, 30, 40]) + b"\x80"  # Y plane + U + V (1px each)
    f1 = bytes([50, 60, 70, 80]) + b"\x80"
    raw = (b"YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420\n"
           + b"FRAME\n" + f0 + b"\x80" + b"FRAME\n" + f1 + b"\x80")
    d = C.decode_y4m(raw)
    assert (d["width"], d["height"], d["n_frames"]) == (2, 2, 2)
    assert d["mean_luma"] == pytest.approx(25.0)   # mean of 10,20,30,40
    assert d["frames"][1][:4] == bytes([50, 60, 70, 80])


def test_y4m_roundtrip_and_frame_slicing():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(5, 4, 6), dtype=np.uint8)
    b = C.encode_y4m(frames, fps=30)
    d = C.decode_y4m(b)
    assert (d["width"], d["height"], d["n_frames"]) == (6, 4, 5)
    for i in range(5):
        assert d["frames"][i][: 4 * 6] == frames[i].tobytes()


def test_y4m_rejects_odd_dims():
    with pytest.raises(ValueError):
        C.encode_y4m(np.zeros((1, 3, 3), dtype=np.uint8))


# ---------------------------------------------------------------------------
# Spark dispatcher over mixed REAL payloads
# ---------------------------------------------------------------------------

def test_decode_media_dispatches_real_containers(spark):
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    pcm = rng.integers(-32768, 32768, size=500, dtype=np.int16)
    vid = rng.integers(0, 256, size=(23, 4, 4), dtype=np.uint8)
    rows = [
        (1, bytearray(C.encode_bmp(img))),
        (2, bytearray(C.encode_wav(pcm, sample_rate=22050))),
        (3, bytearray(C.encode_y4m(vid))),
    ]
    out = {r.media_id: r for r in
           M.decode_media(spark.createDataFrame(
               rows, "media_id long, data binary")).collect()}
    assert (out[1].container, out[1].kind, out[1].width, out[1].height,
            out[1].n_frames) == ("bmp", "image", 6, 8, 1)
    luma = (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).mean()
    assert out[1].content_stat == pytest.approx(luma, rel=1e-6)
    assert (out[2].container, out[2].kind, out[2].sample_rate_hz,
            out[2].n_channels, out[2].n_frames) == ("wav", "audio",
                                                    22050, 1, 500)
    rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
    assert out[2].content_stat == pytest.approx(rms, rel=1e-6)
    assert (out[3].container, out[3].kind, out[3].width, out[3].height,
            out[3].n_frames) == ("y4m", "video", 4, 4, 23)


def test_sample_frames_slices_real_y4m_payloads(spark):
    rng = np.random.default_rng(13)
    vid = rng.integers(0, 256, size=(25, 4, 4), dtype=np.uint8)
    payload = C.encode_y4m(vid)
    df = spark.createDataFrame(
        [(9, "video", bytearray(payload))],
        "media_id long, kind string, data binary")
    got = {r.frame_index: r.frame_digest
           for r in M.sample_frames(df, every_n=10).collect()}
    frames = C.decode_y4m(payload)["frames"]
    expected = {i: hashlib.sha256(frames[i]).hexdigest()[:16]
                for i in range(0, 25, 10)}
    assert got == expected


def test_resize_images_nearest_neighbor_exact(spark):
    """8×8 quadrant pattern → 4×4: floor-mapped nearest-neighbor must
    pick exact source pixels (no interpolation), and the output must be
    a decodable BMP with the new dimensions; non-BMP rows are dropped."""
    import numpy as np

    from barberini_analytics_spark.multimodal import codecs as C
    from barberini_analytics_spark.multimodal.media import resize_images

    px = np.zeros((8, 8, 3), np.uint8)
    px[:4, :4] = (255, 0, 0)      # top-left red
    px[:4, 4:] = (0, 255, 0)      # top-right green
    px[4:, :4] = (0, 0, 255)      # bottom-left blue
    px[4:, 4:] = (255, 255, 0)    # bottom-right yellow
    bmp = C.encode_bmp(px)
    wav = C.encode_wav(np.zeros(16, np.int16))
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav))],
        "media_id long, data binary")
    rows = resize_images(df, 4, 4).collect()
    assert [r["media_id"] for r in rows] == [1]  # WAV filtered out
    out = C.decode_bmp(bytes(rows[0]["data"]))
    assert (out["width"], out["height"]) == (4, 4)
    got = out["pixels"]
    assert tuple(got[0, 0]) == (255, 0, 0)
    assert tuple(got[0, 3]) == (0, 255, 0)
    assert tuple(got[3, 0]) == (0, 0, 255)
    assert tuple(got[3, 3]) == (255, 255, 0)
    # determinism: same bytes on a second run
    again = resize_images(df, 4, 4).collect()[0]["data"]
    assert bytes(again) == bytes(rows[0]["data"])


# ---------------------------------------------------------------------------
# PNG (stdlib-zlib deflate + five-filter scanlines)
# ---------------------------------------------------------------------------

def test_png_roundtrip_exercises_all_filters():
    # encoder cycles filter types per row; >=6 rows covers all five
    rng = np.random.default_rng(0)
    for shape, ch in (((7, 5, 3), 3), ((6, 4), 1), ((6, 4, 4), 4),
                      ((6, 4, 2), 2)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        d = C.decode_png(C.encode_png(img))
        assert (d["pixels"] == img).all()
        assert d["n_channels"] == ch


def test_png_hand_assembled_fixture():
    """A PNG built byte-by-byte in the test (not via encode_png) — the
    decoder is checked against the spec, not against its own encoder."""
    import struct
    import zlib

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

    sig = b"\x89PNG\r\n\x1a\n"
    # 2x2 gray, row filters: None then Sub (second row [10, +30] -> 10,40)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x05\x07" + b"\x01\x0a\x1e")
    png = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) \
        + chunk(b"IEND", b"")
    d = C.decode_png(png)
    assert d["pixels"].tolist() == [[5, 7], [10, 40]]
    assert C.sniff(png) == "png"


def test_png_rejects_unsupported_variants():
    import struct
    import zlib

    with pytest.raises(ValueError):
        C.decode_png(b"\x89PNG\r\n\x1a\njunk")
    # 16-bit depth must be refused, not mis-decoded

    def chunk(t, b):
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF))

    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    png16 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
             + chunk(b"IDAT", zlib.compress(b"\x00\x00\x01"))
             + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        C.decode_png(png16)


def test_png_resize_and_dispatch(spark):
    from barberini_analytics_spark.multimodal.media import (decode_media,
                                                            resize_images)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    png = C.encode_png(img)
    df = spark.createDataFrame([(1, bytearray(png))], "media_id long, data binary")
    meta = decode_media(df).collect()[0]
    assert (meta["container"], meta["kind"]) == ("png", "image")
    assert (meta["width"], meta["height"]) == (8, 8)
    rows = resize_images(df, 4, 4).collect()
    assert rows[0]["width"] == 4
    out = C.decode_png(bytes(rows[0]["data"]))
    # nearest-neighbor floor mapping picks even-indexed pixels
    assert (out["pixels"] == img[::2, ::2]).all()


# ---------------------------------------------------------------------------
# real content features (FFT band energies / luma histograms)
# ---------------------------------------------------------------------------

def test_audio_features_locate_a_sine_tone(spark):
    """A pure 4 kHz tone at 16 kHz sampling must put its energy in the
    band containing bin 128 (frame 512) — real DSP, not a digest."""
    from barberini_analytics_spark.multimodal.media import audio_features

    sr, f0 = 16_000, 4_000
    t = np.arange(sr) / sr
    tone = (np.sin(2 * np.pi * f0 * t) * 20_000).astype(np.int16)
    wav = C.encode_wav(tone, sample_rate=sr)
    df = spark.createDataFrame([(1, bytearray(wav))],
                               "media_id long, data binary")
    row = audio_features(df, n_bands=8, frame=512).collect()[0]
    assert row["n_frames"] == sr // 512
    bands = row["band_log_energy"]
    # geometric edges over [1, 256]: bin 128 falls in the last band
    assert int(np.argmax(bands)) == len(bands) - 1
    # and a DC-free tone leaves the lowest band far below the peak
    assert bands[0] < max(bands) - 2


def test_image_features_histogram_of_known_image(spark):
    from barberini_analytics_spark.multimodal.media import image_features

    # half black, half white gray PNG
    img = np.zeros((8, 8), dtype=np.uint8)
    img[4:] = 255
    df = spark.createDataFrame(
        [(1, bytearray(C.encode_png(img)))], "media_id long, data binary")
    row = image_features(df, n_bins=8).collect()[0]
    hist = row["luma_hist"]
    assert abs(hist[0] - 0.5) < 1e-6 and abs(hist[-1] - 0.5) < 1e-6
    assert sum(hist) == 1.0
    assert abs(row["luma_mean"] - 127.5) < 1e-3


# ---------------------------------------------------------------------------
# GIF (hand-implemented LZW)
# ---------------------------------------------------------------------------

def test_gif_roundtrip_indexed_palette():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 8, size=(10, 7), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    gif = C.encode_gif(idx, pal)
    d = C.decode_gif(gif)
    assert (d["pixels"] == pal[idx]).all()
    assert (d["width"], d["height"], d["n_frames"]) == (7, 10, 1)
    assert C.sniff(gif) == "gif"


def test_gif_hand_assembled_compressed_stream():
    """A truly COMPRESSED LZW stream built code-by-code in the test:
    exercises dictionary growth, the width transition at table size 8,
    and the KwKwK special case — none of which the uncompressed-style
    encoder emits."""
    import struct

    def pack_codes(codes, widths):
        bits = bitpos = 0
        out = bytearray()
        for c, w in zip(codes, widths):
            bits |= c << bitpos
            bitpos += w
            while bitpos >= 8:
                out.append(bits & 0xFF)
                bits >>= 8
                bitpos -= 8
        if bitpos:
            out.append(bits & 0xFF)
        return bytes(out)

    # min_code=2 -> clear=4, end=5. Codes 4,0,6,7,5 decode to six 0-index
    # pixels: 0 -> [0]; 6 (KwKwK) -> [0,0]; 7 (KwKwK again) -> [0,0,0].
    # Table hits size 8 after adding entry 7, so END is read at width 4.
    payload = pack_codes([4, 0, 6, 7, 5], [3, 3, 3, 3, 4])
    pal = np.zeros((4, 3), np.uint8)
    pal[0] = (255, 0, 0)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 6, 1, 0x80 | 0x01, 0, 0)
    gif += pal.tobytes()
    gif += struct.pack("<BHHHHB", 0x2C, 0, 0, 6, 1, 0)
    gif.append(2)
    gif.append(len(payload))
    gif += payload
    gif += b"\x00\x3b"
    d = C.decode_gif(bytes(gif))
    assert d["pixels"].shape == (1, 6, 3)
    assert (d["pixels"][0, :, 0] == 255).all()
    assert d["mean_luma"] == pytest.approx(0.299 * 255)


def test_gif_interlaced_rows_reordered():
    """Interlace flag set: rows must come back in display order (the
    four-pass scheme), checked against a per-row-unique image."""
    idx = np.arange(8, dtype=np.uint8).repeat(4).reshape(8, 4) % 4
    pal = np.array([[0, 0, 0], [85, 85, 85], [170, 170, 170],
                    [255, 255, 255]], np.uint8)
    plain = C.encode_gif(idx, pal)
    # rewrite the image descriptor with the interlace bit and the rows
    # stored in interlace order (passes: 0,8.. / 4,8.. / 2,4.. / 1,2..)
    order = [0] * 0 + [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                       for y in range(start, 8, step)]
    inter = C.encode_gif(idx[order], pal)
    inter = bytearray(inter)
    # image descriptor starts after header(6)+lsd(7)+gct(4*3): flags byte
    # is 9 bytes past the 0x2C marker (marker + left2 top2 w2 h2)
    flags_at = 6 + 7 + 12 + 9
    assert inter[flags_at - 9] == 0x2C
    inter[flags_at] |= 0x40
    d = C.decode_gif(bytes(inter))
    assert (d["pixels"] == pal[idx]).all()


def test_gif_dispatch_and_features(spark):
    from barberini_analytics_spark.multimodal.media import (decode_media,
                                                            image_features)

    idx = np.zeros((4, 4), np.uint8)
    pal = np.array([[255, 255, 255]], np.uint8)
    gif = C.encode_gif(idx, pal)
    df = spark.createDataFrame([(1, bytearray(gif))],
                               "media_id long, data binary")
    meta = decode_media(df).collect()[0]
    assert (meta["container"], meta["kind"]) == ("gif", "image")
    feat = image_features(df).collect()[0]
    assert feat["luma_mean"] == pytest.approx(255.0)


def test_audio_features_stereo_downmixed(spark):
    """Interleaved stereo must be downmixed before framing: a 4 kHz
    tone on BOTH channels must land in the same band as its mono
    rendition — NOT smeared into the top band by channel alternation."""
    from barberini_analytics_spark.multimodal.media import audio_features

    sr, f0 = 16_000, 2_000
    t = np.arange(sr) / sr
    tone = (np.sin(2 * np.pi * f0 * t) * 20_000).astype(np.int16)
    stereo = np.empty(2 * len(tone), np.int16)
    stereo[0::2] = tone          # L
    stereo[1::2] = tone          # R
    df = spark.createDataFrame(
        [(1, bytearray(C.encode_wav(tone, sample_rate=sr))),
         (2, bytearray(C.encode_wav(stereo, sample_rate=sr,
                                    n_channels=2)))],
        "media_id long, data binary")
    rows = {r["media_id"]: r for r in
            audio_features(df, n_bands=8, frame=512).collect()}
    mono_b = rows[1]["band_log_energy"]
    ster_b = rows[2]["band_log_energy"]
    assert int(np.argmax(ster_b)) == int(np.argmax(mono_b))
    # identical L/R content -> near-identical spectra after downmix
    assert np.allclose(mono_b, ster_b, atol=0.1)


def test_gif_truncated_payloads_raise_valueerror():
    """Truncated GIFs must raise the documented ValueError (not
    IndexError) at every cut point in the block walk."""
    idx = np.arange(8, dtype=np.uint8).reshape(2, 4) % 4
    pal = np.array([[0, 0, 0], [85, 85, 85], [170, 170, 170],
                    [255, 255, 255]], np.uint8)
    full = C.encode_gif(idx, pal)
    # also cover the extension path (encode_gif emits none)
    with_ext = full[:13 + 12] + b"\x21\xfe\x05hello\x00" + full[13 + 12:]
    for payload in (full, bytes(with_ext)):
        for cut in range(7, len(payload) - 1):
            try:
                C.decode_gif(payload[:cut])
            except ValueError:
                pass   # the documented failure
            except struct.error:
                raise AssertionError(
                    f"struct.error leaked at cut={cut}")


def test_encode_gif_rejects_indices_past_palette():
    idx = np.full((2, 2), 9, np.uint8)   # table size for 4 colors is 4
    pal = np.zeros((4, 3), np.uint8)
    with pytest.raises(ValueError, match="color table"):
        C.encode_gif(idx, pal)
