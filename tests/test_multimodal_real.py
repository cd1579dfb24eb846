"""Real media decode: BMP/WAV full decode round-trips (random data, every
padding case), PNG/GIF/JPEG header parses on handcrafted valid files, WAV
cross-checked against the stdlib ``wave`` module, and strict-error paths.
The registry round-trip queries are covered by the oracle gate; these
tests pin the decoders themselves."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from data_pipeline_stripe_spark.llm import multimodal as mm

rng = np.random.default_rng(42)


# -- BMP --------------------------------------------------------------------

@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (3, 2), (4, 4), (5, 1),
                                 (31, 17), (64, 48)])
def test_bmp_roundtrip_random_pixels(w, h):
    # w covers every row-padding remainder (w*3 % 4 in {0,1,2,3})
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = mm.encode_bmp(img)
    assert mm.sniff_media_format(payload) == "bmp"
    assert mm.decode_image_real(payload) == (w, h)
    np.testing.assert_array_equal(mm.decode_bmp_pixels(payload), img)


def test_bmp_file_size_field_is_consistent():
    payload = mm.encode_bmp(rng.integers(0, 256, (5, 7, 3), dtype=np.uint8))
    declared = struct.unpack_from("<I", payload, 2)[0]
    assert declared == len(payload)


def test_bmp_top_down_row_order():
    img = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    payload = bytearray(mm.encode_bmp(img[::-1]))  # encode flipped...
    struct.pack_into("<i", payload, 22, -4)        # ...then declare top-down
    np.testing.assert_array_equal(mm.decode_bmp_pixels(bytes(payload)), img)


def test_bmp_rejects_unsupported_depth():
    payload = bytearray(mm.encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    struct.pack_into("<H", payload, 28, 8)  # claim 8-bit
    with pytest.raises(ValueError, match="24-bit"):
        mm.decode_bmp_pixels(bytes(payload))


# -- WAV --------------------------------------------------------------------

@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip_vs_stdlib(channels):
    frames = 480
    samples = rng.integers(-30000, 30000, frames * channels).astype(np.int16)
    payload = mm.encode_wav_pcm16(samples, 16000, channels)
    assert mm.sniff_media_format(payload) == "wav"

    # our encoder's output must be readable by the independent stdlib parser
    with wave.open(io.BytesIO(payload)) as wf:
        assert (wf.getframerate(), wf.getnchannels(), wf.getnframes(),
                wf.getsampwidth()) == (16000, channels, frames, 2)

    rate, ch, n_frames, rms = mm.decode_wav(payload)
    assert (rate, ch, n_frames) == (16000, channels, frames)
    expected = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
    assert rms == pytest.approx(expected)


def test_wav_chunk_walk_skips_extra_chunks():
    samples = np.array([100, -100, 100, -100], dtype=np.int16)
    payload = mm.encode_wav_pcm16(samples, 8000, 1)
    # splice a LIST chunk (odd size → padded) between fmt and data
    fmt_end = payload.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\0"
    spliced = payload[:fmt_end] + extra + payload[fmt_end:]
    spliced = (spliced[:4]
               + struct.pack("<I", len(spliced) - 8) + spliced[8:])
    rate, ch, n_frames, rms = mm.decode_wav(spliced)
    assert (rate, ch, n_frames, rms) == (8000, 1, 4, 100.0)


def test_wav_rejects_non_pcm():
    payload = bytearray(mm.encode_wav_pcm16(
        np.zeros(4, dtype=np.int16), 8000, 1))
    fmt_at = payload.index(b"fmt ") + 8
    struct.pack_into("<H", payload, fmt_at, 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="PCM16"):
        mm.decode_wav(bytes(payload))


def test_wav_rejects_truncated():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        mm.decode_wav(b"RIFF\x00\x00\x00\x00JUNK")


# -- PNG / GIF / JPEG header parses ----------------------------------------

def _make_png(w: int, h: int) -> bytes:
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # one filter byte (0=None) per row + raw RGB pixels, zlib-compressed
    raw = b"".join(b"\0" + b"\x10\x20\x30" * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _make_gif(w: int, h: int) -> bytes:
    return (b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"
            + b"\x3b")  # no global color table, trailer


def _make_jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\0" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\0" * 65
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11)
            + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00")
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


@pytest.mark.parametrize("maker,kind", [
    (_make_png, "png"), (_make_gif, "gif"), (_make_jpeg, "jpeg"),
])
def test_header_dimension_parse(maker, kind):
    payload = maker(640, 480)
    assert mm.sniff_media_format(payload) == kind
    assert mm.decode_image_real(payload) == (640, 480)


def test_jpeg_walk_skips_restart_markers():
    # RST markers are standalone (no length field); the walk must not
    # misread the following bytes as a segment length
    payload = _make_jpeg(12, 34)
    spliced = payload[:2] + b"\xff\xd0\xff\xd1" + payload[2:]
    assert mm.decode_image_real(spliced) == (12, 34)


def test_jpeg_without_sof_rejected():
    with pytest.raises(ValueError, match="no SOF"):
        mm.decode_image_real(b"\xff\xd8\xff\xd9")


def test_unknown_format_rejected():
    with pytest.raises(ValueError, match="unsupported image format"):
        mm.decode_image_real(b"\x00\x01\x02\x03 not media")


# -- Spark round-trip queries (small slice; oracle gate runs the full set) --

def test_roundtrip_queries_match_arithmetic(spark, sf_dir):
    from data_pipeline_stripe_spark.queries import REGISTRY

    img = REGISTRY["multimodal_bmp_roundtrip"].fn(spark, sf_dir)
    for r in img.collect():
        i = r.doc_id
        assert (r.width, r.height) == (i % 31 + 1, i % 17 + 1)
        assert (r.mean_r, r.mean_g, r.mean_b) == (
            i % 256, (i * 3) % 256, (i * 7) % 256)

    wav = REGISTRY["multimodal_wav_roundtrip"].fn(spark, sf_dir)
    for r in wav.collect():
        i = r.doc_id
        assert (r.sample_rate, r.n_channels, r.n_frames, r.rms) == (
            8000 * (i % 3 + 1), i % 2 + 1, 50 + i % 50, 100 + i % 900)


# -- error-contract fuzz: decoders NEVER leak a foreign exception -----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_MAGIC = st.sampled_from([
    b"BM", b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a", b"\xff\xd8",
    b"RIFF", b""
])
_FUZZ = settings(max_examples=80, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


@given(magic=_MAGIC, tail=st.binary(max_size=64))
@_FUZZ
def test_decoders_raise_only_valueerror_on_garbage(magic, tail):
    """For ANY payload — truncated headers, corrupt bodies, random bytes
    after a valid magic — every decoder either returns a result or
    raises ValueError. A struct.error / IndexError escaping here would
    kill a 100 TB mapInPandas batch with an undiagnosable traceback;
    a silently wrong answer would be worse (the contract the docstrings
    promise: 'a clear error, never a silently wrong answer')."""
    payload = magic + tail
    for fn in (mm.decode_image_real, mm.decode_bmp_pixels, mm.decode_wav,
               mm.decode_png_pixels, mm.decode_gif_frames):
        try:
            fn(payload)
        except ValueError:
            pass


@given(flip=st.integers(8, 200), bit=st.integers(0, 7))
@settings(max_examples=40, deadline=None)
def test_png_any_single_bitflip_raises_not_wrong_pixels(flip, bit):
    """Flip ANY single bit past the signature of a valid PNG: the decoder
    must either raise ValueError (CRC/zlib/structure catch it) or — if
    the flip landed in a bit the decode doesn't depend on — reproduce
    the original pixels. It must never return DIFFERENT pixels: CRC
    verification is the integrity contract."""
    import numpy as np

    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    payload = bytearray(mm.encode_png(img))
    idx = 8 + (flip % (len(payload) - 8))
    payload[idx] ^= 1 << bit
    try:
        out = mm.decode_png_pixels(bytes(payload))
        assert (out == img).all()
    except ValueError:
        pass


def test_jpeg_fill_bytes_before_markers_are_skipped():
    """ITU T.81 allows any number of 0xFF fill bytes before a marker;
    the segment walk must skip them, not desync."""
    sof = (b"\xff\xc0" + struct.pack(">H", 11)
           + b"\x08" + struct.pack(">HH", 48, 64) + b"\x01\x01\x11\x00")
    plain = b"\xff\xd8" + sof
    padded = b"\xff\xd8" + b"\xff\xff" + sof  # fill bytes before SOF
    assert mm.decode_image_real(plain) == (64, 48)
    assert mm.decode_image_real(padded) == (64, 48)


def test_wav_truncated_data_chunk_raises_not_wrong_answer():
    """A data chunk whose declared size overruns the payload must raise,
    never silently decode partial audio."""
    full = mm.encode_wav_pcm16(np.arange(1000, dtype=np.int16), 16000)
    truncated = full[: len(full) - 500]
    with pytest.raises(ValueError, match="truncated WAV"):
        mm.decode_wav(truncated)
    # odd-length PCM16 data chunk: typed error, not a numpy message
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
            + b"data" + struct.pack("<I", 3) + b"\x01\x02\x03")
    odd = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="odd byte length"):
        mm.decode_wav(odd)


def test_audio_windows_known_values(spark):
    # 64 samples: first 32 alternate +-100 (energy 32*100^2, 31 strict
    # crossings); next 32 are the constant 7 (no crossings); a 65th
    # sample would start a partial window and must be dropped.
    samples = np.empty(65, dtype=np.int16)
    samples[:32] = np.where(np.arange(32) % 2 == 0, 100, -100)
    samples[32:64] = 7
    samples[64] = 9999
    payload = mm.encode_wav_pcm16(samples, 16000, 1)
    media = spark.createDataFrame(
        [(1, payload)], "doc_id long, payload binary"
    )
    rows = {r.window_idx: r
            for r in mm.extract_audio_windows(media, window=32).collect()}
    assert set(rows) == {0, 1}                       # partial window dropped
    assert rows[0].sum_sq == 32 * 100 * 100
    assert rows[0].n_zero_cross == 31
    assert rows[0].rms == 100.0                      # exact: sqrt(10000)
    assert rows[1].sum_sq == 32 * 49
    assert rows[1].n_zero_cross == 0
    assert rows[1].rms == 7.0


def test_audio_windows_rejects_stereo(spark):
    stereo = mm.encode_wav_pcm16(np.arange(64, dtype=np.int16), 16000, 2)
    media = spark.createDataFrame(
        [(1, stereo)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="mono-only"):
        mm.extract_audio_windows(media).collect()


def test_decode_wav_samples_roundtrip():
    samples = np.array([3, -5, 0, 32767, -32768], dtype=np.int16)
    rate, ch, decoded = mm.decode_wav_samples(
        mm.encode_wav_pcm16(samples, 8000, 1))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(decoded, samples)


def test_resize_bmp_nearest_neighbor_known_mapping(spark):
    # 2x2 source with distinct corners; 4x4 NN upscale must replicate
    # each source pixel into a 2x2 block (src = (dst * 2) // 4).
    src = np.array([[[10, 10, 10], [20, 20, 20]],
                    [[30, 30, 30], [40, 40, 40]]], dtype=np.uint8)
    media = spark.createDataFrame(
        [(7, mm.encode_bmp(src))], "doc_id long, payload binary"
    )
    out = mm.resize_bmp_images(media, width=4, height=4).collect()[0]
    up = mm.decode_bmp_pixels(bytes(out.payload))
    assert up.shape == (4, 4, 3)
    expect = np.repeat(np.repeat(src, 2, axis=0), 2, axis=1)
    assert np.array_equal(up, expect)
    # downscale 2x2 -> 1x1 keeps the top-left pixel (floor mapping)
    down = mm.decode_bmp_pixels(bytes(
        mm.resize_bmp_images(media, width=1, height=1)
        .collect()[0].payload))
    assert np.array_equal(down, src[:1, :1])


# -- GIF (animated): LZW codec + frame walk ---------------------------------

@pytest.mark.parametrize("n_colors,w,h,nf", [(2, 3, 3, 1), (4, 8, 6, 5),
                                             (16, 50, 40, 3), (256, 64, 64, 2)])
def test_gif_roundtrip_random_frames(n_colors, w, h, nf):
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    frames = [rng.integers(0, n_colors, (h, w), dtype=np.uint8)
              for _ in range(nf)]
    gif = mm.encode_gif(frames, pal)
    assert mm.sniff_media_format(gif) == "gif"
    assert mm.decode_image_real(gif) == (w, h)
    dw, dh, dpal, dframes = mm.decode_gif_frames(gif)
    assert (dw, dh) == (w, h) and len(dframes) == nf
    np.testing.assert_array_equal(dpal[:n_colors], pal)
    for a, b in zip(frames, dframes):
        np.testing.assert_array_equal(a, b)


def test_gif_lzw_table_reset_on_large_frame():
    # 60k pixels of 2-color noise exhausts the 4096-entry LZW table
    # several times; the in-stream CLEAR/reset path must round-trip.
    frame = rng.integers(0, 2, (200, 300), dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    _, _, _, frames = mm.decode_gif_frames(mm.encode_gif([frame], pal))
    np.testing.assert_array_equal(frames[0], frame)


def test_gif_lzw_repetitive_input_cscsc_case():
    # long runs drive the decoder through code == next_code (cScSc)
    frame = np.tile(np.array([0, 0, 0, 1, 1, 0, 0, 1], dtype=np.uint8),
                    (64, 16))
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    _, _, _, frames = mm.decode_gif_frames(mm.encode_gif([frame], pal))
    np.testing.assert_array_equal(frames[0], frame)


def test_gif_extension_blocks_are_skipped():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    frame = rng.integers(0, 2, (4, 5), dtype=np.uint8)
    gif = bytearray(mm.encode_gif([frame], pal))
    # splice a Graphic Control Extension before the image descriptor
    idesc = gif.index(0x2C)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x0A, 0x00, 0x00, 0x00])
    gif[idesc:idesc] = gce
    _, _, _, frames = mm.decode_gif_frames(bytes(gif))
    np.testing.assert_array_equal(frames[0], frame)


def test_gif_rejects_interlace_and_non_gif():
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    gif = bytearray(mm.encode_gif(
        [np.zeros((2, 2), dtype=np.uint8)], pal))
    idesc = gif.index(0x2C)
    gif[idesc + 9] |= 0x40  # set interlace flag
    with pytest.raises(ValueError, match="interlaced"):
        mm.decode_gif_frames(bytes(gif))
    with pytest.raises(ValueError, match="not a GIF"):
        mm.decode_gif_frames(b"RIFFxxxxWAVE")


def test_gif_encode_validates_palette_and_frame_shape():
    with pytest.raises(ValueError, match="power of two"):
        mm.encode_gif([np.zeros((2, 2), dtype=np.uint8)],
                      np.zeros((3, 3), dtype=np.uint8))
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    with pytest.raises(ValueError, match="share the logical screen"):
        mm.encode_gif([np.zeros((2, 2), dtype=np.uint8),
                       np.zeros((3, 2), dtype=np.uint8)], pal)


def test_ahash_brightness_shift_invariant():
    """The perceptual property: a uniform brightness shift moves every
    gray AND the mean by the same amount, so the threshold pattern — and
    the hash — is unchanged."""
    rng = np.random.default_rng(7)
    rgb = rng.integers(40, 160, size=(16, 16, 3), dtype=np.uint8)
    shifted = (rgb.astype(np.int64) + 50).astype(np.uint8)  # no clipping
    assert mm.ahash64(rgb) == mm.ahash64(shifted)


def test_ahash_nn_upscale_invariant():
    """2× NN upscale maps the 8×8 sample grid onto the same source
    pixels, so the fingerprint survives resolution changes."""
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    up = rgb.repeat(2, axis=0).repeat(2, axis=1)
    assert mm.ahash64(rgb) == mm.ahash64(up)


def test_ahash_distinguishes_structure():
    y, x, _ = np.ogrid[0:16, 0:16, 0:3]
    horiz = ((x * 16) % 256 * np.ones((16, 16, 3))).astype(np.uint8)
    vert = ((y * 16) % 256 * np.ones((16, 16, 3))).astype(np.uint8)
    assert mm.ahash64(horiz) != mm.ahash64(vert)
    # and the packed halves are non-negative signed-long-safe values
    hi, lo = mm.ahash64(horiz)
    assert 0 <= hi < 2**32 and 0 <= lo < 2**32


# -- PNG codec ---------------------------------------------------------------

@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (31, 7), (8, 23), (5, 5)])
def test_png_roundtrip_random_pixels(w, h):
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    back = mm.decode_png_pixels(mm.encode_png(img))
    assert back.shape == img.shape
    assert (back == img).all()


def test_png_encoder_cycles_all_five_filters():
    """h ≥ 5 output must contain filter bytes 0..4 — the decoder is being
    tested against every filter type, not just None."""
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    payload = mm.encode_png(img)
    # IDAT body: skip sig(8) + IHDR chunk(12+13); chunk = len tag body crc
    (ln,) = struct.unpack_from(">I", payload, 33)
    raw = zlib.decompress(payload[41:41 + ln])
    stride = 4 * 3
    filters = {raw[y * (stride + 1)] for y in range(6)}
    assert filters == {0, 1, 2, 3, 4}
    assert (mm.decode_png_pixels(payload) == img).all()


def test_png_crc_corruption_raises():
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    payload = bytearray(mm.encode_png(img))
    payload[50] ^= 0xFF  # somewhere inside IDAT body
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png_pixels(bytes(payload))


def test_png_rejects_unsupported_color_type():
    # hand-build a grayscale (color type 0) IHDR
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", ihdr)
               + mm._png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
               + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truecolor"):
        mm.decode_png_pixels(payload)


def test_png_rgba_alpha_dropped():
    """Color type 6 (RGBA) decodes; the alpha plane is dropped."""
    h, w = 4, 3
    rgba = np.arange(h * w * 4, dtype=np.uint8).reshape(h, w * 4)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", ihdr)
               + mm._png_chunk(b"IDAT", zlib.compress(raw))
               + mm._png_chunk(b"IEND", b""))
    out = mm.decode_png_pixels(payload)
    assert out.shape == (h, w, 3)
    assert (out == rgba.reshape(h, w, 4)[:, :, :3]).all()


def test_png_wrong_idat_length_raises():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", ihdr)
               + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 5))
               + mm._png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IDAT length"):
        mm.decode_png_pixels(payload)
