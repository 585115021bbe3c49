"""Real-codec tests for the multimodal decode path: the built-in
pure stdlib+numpy PNG/BMP decoders (operators/multimodal.py) must
reconstruct geometry and sample histograms from images ENCODED by this
test's own independent writers — no third-party codec involved. A PIL
fallback test runs only where pillow is installed (not this container).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from common_survey_data_pipeline_spark.operators.multimodal import (
    _decode_bmp,
    _decode_image_real,
    _decode_png,
    decode_images,
)

# ---------------------------------------------------------------------------
# Independent encoders (forward filters — the decoder implements the inverse)
# ---------------------------------------------------------------------------

_COLOR_CH = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_filter_row(row, prev, ch, ftype):
    """Apply PNG filter `ftype` to an unfiltered row (uint8 arrays)."""
    out = np.zeros_like(row)
    for x in range(len(row)):
        a = int(row[x - ch]) if x >= ch else 0
        b = int(prev[x])
        c = int(prev[x - ch]) if x >= ch else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (int(row[x]) - pred) & 0xFF
    return out


def encode_png(pixels: np.ndarray, color_type: int, filter_type: int) -> bytes:
    """Minimal PNG writer: `pixels` is (h, w*ch) uint8; every scanline
    uses `filter_type` (0-4)."""
    ch = _COLOR_CH[color_type]
    h, stride = pixels.shape
    w = stride // ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        raw.append(filter_type)
        raw.extend(_png_filter_row(pixels[y], prev, ch, filter_type).tobytes())
        prev = pixels[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_bmp24(pixels: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BMP writer: `pixels` is (h, w*3) uint8."""
    h, stride_px = pixels.shape
    w = stride_px // 3
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage
        body.extend(pixels[y].tobytes())
        body.extend(b"\x00" * (stride - w * 3))
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + bytes(body)


def _expected_hist(samples: np.ndarray) -> list[float]:
    hist = np.bincount(samples.reshape(-1) >> 5, minlength=8).astype("float64")
    return [round(float(v / samples.size), 6) for v in hist]


def _pixels(h: int, w: int, ch: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, (h, w * ch), dtype=np.uint8)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    px = _pixels(5, 7, 3, seed=filter_type)
    w, h, feats = _decode_png(encode_png(px, color_type=2, filter_type=filter_type))
    assert (w, h) == (7, 5)
    assert feats == _expected_hist(px)


@pytest.mark.parametrize("color_type", [0, 2, 4, 6])
def test_png_roundtrip_color_types(color_type):
    ch = _COLOR_CH[color_type]
    px = _pixels(4, 6, ch, seed=10 + color_type)
    w, h, feats = _decode_png(encode_png(px, color_type=color_type, filter_type=4))
    assert (w, h) == (6, 4)
    assert feats == _expected_hist(px)


def test_png_unsupported_profile_is_loud():
    px = _pixels(2, 2, 3, seed=0)
    good = encode_png(px, color_type=2, filter_type=0)
    # corrupt IHDR bit depth 8 -> 16 (byte 24: magic 8 + len 4 + type 4 + w 4 + h 4)
    bad = bytearray(good)
    bad[24] = 16
    with pytest.raises(NotImplementedError, match="depth=16"):
        _decode_png(bytes(bad))


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_with_row_padding():
    px = _pixels(4, 3, 3, seed=3)  # width 3 -> 9-byte rows, padded to 12
    w, h, feats = _decode_bmp(encode_bmp24(px))
    assert (w, h) == (3, 4)
    assert feats == _expected_hist(px)


def test_real_decoder_dispatches_on_magic_bytes():
    png = encode_png(_pixels(3, 3, 3, seed=7), color_type=2, filter_type=1)
    bmp = encode_bmp24(_pixels(3, 3, 3, seed=8))
    assert _decode_image_real(png)[:2] == (3, 3)
    assert _decode_image_real(bmp)[:2] == (3, 3)


def test_unknown_format_without_pil_is_loud():
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow installed; fallback covers unknown formats")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PNG nor BMP"):
        _decode_image_real(b"\xff\xd8\xff\xe0 not really a jpeg")


def test_pil_fallback_decodes_jpeg():
    PIL = pytest.importorskip("PIL")  # noqa: N806 - absent in this container
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (9, 5), (255, 0, 0)).save(buf, format="JPEG")
    w, h, feats = _decode_image_real(buf.getvalue())
    assert (w, h) == (9, 5)
    assert len(feats) == 8 and abs(sum(feats) - 1.0) < 1e-3


# ---------------------------------------------------------------------------
# End-to-end through the Spark mapInPandas stage
# ---------------------------------------------------------------------------

def test_decode_images_real_profile_on_png_payloads(spark):
    pxs = [_pixels(4 + i, 5, 3, seed=20 + i) for i in range(6)]
    rows = [
        (i, bytearray(encode_png(px, color_type=2, filter_type=i % 5)))
        for i, px in enumerate(pxs)
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in decode_images(media, use_fake=False).collect()
    }
    assert len(got) == 6
    for i, px in enumerate(pxs):
        assert got[i]["width"] == 5
        assert got[i]["height"] == 4 + i
        assert [round(f, 6) for f in got[i]["features"]] == _expected_hist(px)


# ---------------------------------------------------------------------------
# Audio leg: PCM16 decode
# ---------------------------------------------------------------------------

def test_decode_audio_pcm16_stats(spark):
    from common_survey_data_pipeline_spark.operators.multimodal import (
        decode_audio,
    )

    wave = np.array([1000, -1000, 1000, -1000], dtype="<i2")
    rows = [
        (1, bytearray(wave.tobytes())),
        # odd trailing byte truncates like a real PCM reader
        (2, bytearray(wave.tobytes() + b"\x7f")),
        # empty payload: zero samples, zero stats, no crash
        (3, bytearray(b"")),
        # null payload row dropped, not crashed on
        (4, None),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_audio(media).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_samples"] == 4
    assert got[1]["rms"] == 1000.0 and got[1]["peak"] == 1000
    assert got[1]["duration_s"] == 4 / 16000
    assert got[2]["n_samples"] == 4 and got[2]["payload_bytes"] == 9
    assert got[3]["n_samples"] == 0
    assert got[3]["rms"] == 0.0 and got[3]["peak"] == 0


def test_attach_audio_payload_deterministic(spark):
    from common_survey_data_pipeline_spark.operators.multimodal import (
        attach_audio_payload,
        decode_audio,
    )

    docs = spark.createDataFrame([(0,), (8,), (16005,)], "doc_id long")
    out = {
        r["doc_id"]: r
        for r in decode_audio(attach_audio_payload(docs)).collect()
    }
    for i in (0, 8, 16005):
        n = 16000 + i % 16000
        amp = (i % 7 + 1) * 1000
        assert out[i]["n_samples"] == n
        assert out[i]["payload_bytes"] == 2 * n
        assert out[i]["rms"] == float(amp)
        assert out[i]["peak"] == amp
