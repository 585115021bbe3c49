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
    with pytest.raises(NotImplementedError, match="needs pillow"):
        _decode_image_real(b"GIF89a not a supported format")


# ---------------------------------------------------------------------------
# JPEG: independent baseline encoder (forward DCT + canonical Huffman) —
# the decoder under test implements the inverse from the T.81 spec.
# The encoder uses its OWN flat Huffman tables (all-8-bit DC codes,
# all-9-bit AC codes, written into DHT), so a decoder that hardcodes
# the Annex K tables instead of reading DHT fails here.
# ---------------------------------------------------------------------------

def _zigzag_order() -> list[int]:
    """Raster index of each zigzag position, generated from the
    diagonal-walk definition (independent check of any hardcoded
    table): odd diagonals walk row-ascending, even ones descending."""
    order = []
    for s in range(15):
        rows = list(range(max(0, s - 7), min(s, 7) + 1))
        for r in rows if s % 2 else reversed(rows):
            order.append(r * 8 + (s - r))
    return order


_ZZ = _zigzag_order()
_FDCT_M = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
)
# flat canonical tables: DC = 12 symbols, all length 8 (code i = i);
# AC = 255 symbols, all length 9 (code i = i) — symbol 0xFF (run 15 /
# size 15) can never be emitted: with all-ones quant tables the AC
# magnitude category tops out at 11
_DC_BITS = [0] * 16
_DC_BITS[7] = 12
_AC_BITS = [0] * 16
_AC_BITS[8] = 255


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:  # pad final byte with 1-bits
        while self.n:
            self.write(1, 1)


def _cat(v: int) -> tuple[int, int]:
    """JPEG magnitude category + appended bits for a coefficient."""
    a = abs(v)
    cat = a.bit_length()
    bits = v if v >= 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_block(bw: _BitWriter, block: np.ndarray, pred: int) -> int:
    coef = _FDCT_M.T @ (block.astype(np.float64) - 128.0) @ _FDCT_M
    zz = np.round(coef.reshape(-1)[_ZZ]).astype(int)  # quant table = 1s
    cat, bits = _cat(int(zz[0]) - pred)
    bw.write(cat, 8)  # flat DC table: code == symbol, length 8
    bw.write(bits, cat)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(0xF0, 9)  # ZRL
            run -= 16
        cat, bits = _cat(v)
        bw.write((run << 4) | cat, 9)  # flat AC table: code == symbol
        bw.write(bits, cat)
        run = 0
    if run:
        bw.write(0x00, 9)  # EOB
    return int(zz[0])


def _seg(marker: int, data: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data


def encode_jpeg(
    pixels: np.ndarray, subsample_420: bool = False, restart: int = 0
) -> bytes:
    """Minimal baseline JPEG writer. ``pixels`` is (h, w) uint8 grey or
    (h, w, 3) uint8 RGB; quant tables are all-ones (near-lossless);
    optional 4:2:0 chroma subsampling and restart interval."""
    grey = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if grey:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
    else:
        px = pixels.astype(np.float64)
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample_420:
            pad_h, pad_w = -h % 2, -w % 2
            cbp = np.pad(cb, ((0, pad_h), (0, pad_w)), mode="edge")
            crp = np.pad(cr, ((0, pad_h), (0, pad_w)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for (sh, sv), pl in zip(samp, planes):
        th, tw = mcuy * 8 * sv, mcux * 8 * sh
        padded.append(
            np.pad(
                pl,
                ((0, th - pl.shape[0]), (0, tw - pl.shape[1])),
                mode="edge",
            )
        )
    bw = _BitWriter()
    preds = [0] * len(planes)
    out_entropy = bytearray()
    rst = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            bw.align()
            out_entropy.extend(bw.buf)
            out_entropy.extend(bytes([0xFF, 0xD0 + rst % 8]))
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, ((sh, sv), pl) in enumerate(zip(samp, padded)):
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    preds[ci] = _encode_block(
                        bw, pl[y0 : y0 + 8, x0 : x0 + 8], preds[ci]
                    )
    bw.align()
    out_entropy.extend(bw.buf)

    qt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        struct.pack(">BBB", i + 1, (samp[i][0] << 4) | samp[i][1], 0)
        for i in range(ncomp)
    )
    dht = _seg(
        0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(range(12))
    ) + _seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(range(255)))
    sos = struct.pack(">B", ncomp) + b"".join(
        struct.pack(">BB", i + 1, 0x00) for i in range(ncomp)
    ) + bytes([0, 63, 0])
    dri = _seg(0xDD, struct.pack(">H", restart)) if restart else b""
    return (
        b"\xff\xd8"
        + qt
        + dri
        + _seg(0xC0, sof)
        + dht
        + _seg(0xDA, sos)
        + bytes(out_entropy)
        + b"\xff\xd9"
    )


def _bin_center_pixels(h: int, w: int, ch: int, seed: int) -> np.ndarray:
    """Pixels restricted to 32-level bin CENTERS (16, 48, ..., 240):
    the all-ones quant table reconstructs within a couple of levels, so
    the decoded 8-bin histogram is exactly the input's."""
    rs = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return (rs.randint(0, 8, shape) * 32 + 16).astype(np.uint8)


def test_jpeg_roundtrip_grayscale():
    from common_survey_data_pipeline_spark.operators.jpeg import decode_jpeg

    px = _bin_center_pixels(13, 11, 1, seed=1)  # non-multiple-of-8 dims
    w, h, feats = decode_jpeg(encode_jpeg(px))
    assert (w, h) == (11, 13)
    assert feats == _expected_hist(px)


def test_jpeg_roundtrip_rgb_444():
    from common_survey_data_pipeline_spark.operators.jpeg import decode_jpeg

    px = _bin_center_pixels(16, 9, 3, seed=2)
    w, h, feats = decode_jpeg(encode_jpeg(px))
    assert (w, h) == (9, 16)
    # RGB→YCbCr→RGB adds rounding on top of DCT rounding; bin centers
    # keep everything inside its 32-level bin
    assert feats == _expected_hist(px)


def test_jpeg_roundtrip_420_subsampled():
    from common_survey_data_pipeline_spark.operators.jpeg import decode_jpeg

    # constant chroma (single RGB tint per image) makes 2x2 chroma
    # averaging lossless, isolating the sampling-factor block layout
    lum = _bin_center_pixels(19, 21, 1, seed=3).astype(np.float64)
    px = np.stack([lum, lum, lum], axis=-1).astype(np.uint8)  # grey RGB
    w, h, feats = decode_jpeg(encode_jpeg(px, subsample_420=True))
    assert (w, h) == (21, 19)
    assert feats == _expected_hist(px)


def test_jpeg_restart_markers():
    from common_survey_data_pipeline_spark.operators.jpeg import decode_jpeg

    px = _bin_center_pixels(24, 40, 1, seed=4)  # 15 MCUs → several RSTs
    plain = decode_jpeg(encode_jpeg(px))
    with_rst = decode_jpeg(encode_jpeg(px, restart=2))
    assert plain == with_rst == (40, 24, _expected_hist(px))


def test_jpeg_fill_bytes_before_restart_markers():
    """T.81 B.1.1.2 allows 0xFF fill bytes in front of any marker —
    including RSTn inside the entropy stream (regression: these used to
    read as end-of-scan, truncating the image)."""
    from common_survey_data_pipeline_spark.operators.jpeg import decode_jpeg

    px = _bin_center_pixels(24, 40, 1, seed=12)
    plain = encode_jpeg(px, restart=2)
    i = plain.index(b"\xff\xda")
    (seg_len,) = struct.unpack_from(">H", plain, i + 2)
    body_start = i + 2 + seg_len
    head, body = plain[:body_start], plain[body_start:]
    # the only 0xFF bytes in the entropy body are stuffing (FF 00),
    # RSTn and EOI, so a byte-pair replace cannot hit entropy data
    for r in range(8):
        body = body.replace(
            bytes([0xFF, 0xD0 + r]), bytes([0xFF, 0xFF, 0xD0 + r])
        )
    padded = head + body
    assert padded != plain  # restart=2 on 15 MCUs guarantees RSTs exist
    assert decode_jpeg(padded) == decode_jpeg(plain)


def test_jpeg_noninterleaved_scan_is_loud():
    """One-scan-per-component baseline JPEGs are spec-legal; decoding
    only the first scan would silently return a luma-only image
    (regression: must raise, not return grey)."""
    from common_survey_data_pipeline_spark.operators.jpeg import decode_jpeg

    good = encode_jpeg(_bin_center_pixels(8, 8, 3, seed=13))
    i = good.index(b"\xff\xda")
    (seg_len,) = struct.unpack_from(">H", good, i + 2)
    sos1 = struct.pack(">B", 1) + struct.pack(">BB", 1, 0x00) + bytes(
        [0, 63, 0]
    )
    bad = good[:i] + _seg(0xDA, sos1) + good[i + 2 + seg_len :]
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg(bad)


def test_jpeg_undefined_table_reference_is_loud():
    """An SOS that selects a DHT table id no segment defined must raise
    the module's uniform 'malformed JPEG' ValueError (which the decode
    stage classifies), not an opaque KeyError (regression)."""
    from common_survey_data_pipeline_spark.operators.jpeg import decode_jpeg

    good = encode_jpeg(_bin_center_pixels(8, 8, 3, seed=13))
    i = good.index(b"\xff\xda")
    # SOS payload: [ns, (cid, tt)*ns, ss, se, ah_al]; point component
    # 0's dc/ac selectors at table id 7, which no DHT defines
    bad = bytearray(good)
    bad[i + 4 + 2] = 0x77
    with pytest.raises(ValueError, match="malformed JPEG.*Huffman"):
        decode_jpeg(bytes(bad))


def test_jpeg_fractional_sampling_is_loud():
    """Sampling factors with non-divisible ratios (e.g. 3:2) are legal
    per T.81 but outside the integer np.repeat upsampler — must raise a
    named error, not a numpy shape mismatch."""
    from common_survey_data_pipeline_spark.operators.jpeg import _finish

    scan = [{"h": 3, "v": 1}, {"h": 2, "v": 1}, {"h": 2, "v": 1}]
    planes = [np.zeros((8, 24)), np.zeros((8, 16)), np.zeros((8, 16))]
    with pytest.raises(NotImplementedError, match="non-integer"):
        _finish(planes, scan, 24, 8, 3, 1)


def test_jpeg_unsupported_profile_falls_back_to_pil(monkeypatch):
    """A JPEG outside the built-in baseline profile (here: progressive)
    must fall through to PIL when pillow is importable instead of
    failing the decode stage (regression: the magic-byte dispatch used
    to raise without trying PIL)."""
    import sys
    import types

    from common_survey_data_pipeline_spark.operators.multimodal import (
        _decode_image_real,
    )

    progressive = encode_jpeg(_bin_center_pixels(8, 8, 1, seed=14)).replace(
        b"\xff\xc0", b"\xff\xc2", 1
    )

    class _FakeIm:
        width, height = 8, 8

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def convert(self, mode):
            assert mode == "RGB"
            return np.full((8, 8, 3), 16, dtype=np.uint8)

    pil = types.ModuleType("PIL")
    pil.Image = types.SimpleNamespace(open=lambda buf: _FakeIm())
    monkeypatch.setitem(sys.modules, "PIL", pil)
    w, h, feats = _decode_image_real(progressive)
    assert (w, h) == (8, 8)
    assert feats[0] == 1.0  # every fake sample (16) lands in bin 0


def test_jpeg_progressive_is_loud():
    from common_survey_data_pipeline_spark.operators.jpeg import decode_jpeg

    good = encode_jpeg(_bin_center_pixels(8, 8, 1, seed=5))
    # rewrite the SOF0 marker (FFC0) to SOF2 (FFC2): progressive
    bad = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bad)


def test_real_decoder_dispatches_jpeg_magic():
    px = _bin_center_pixels(6, 6, 3, seed=6)
    w, h, feats = _decode_image_real(encode_jpeg(px))
    assert (w, h) == (6, 6)
    assert feats == _expected_hist(px)


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


def test_jpeg_truncated_payloads_fail_loudly():
    """Corrupt inputs must raise, never hang or return wrong geometry:
    cut the stream inside the header and inside the entropy data."""
    import struct as _struct

    from common_survey_data_pipeline_spark.operators.jpeg import decode_jpeg

    good = encode_jpeg(_bin_center_pixels(16, 16, 1, seed=9))
    for cut in (4, len(good) // 2, len(good) - 3):
        with pytest.raises((ValueError, _struct.error, KeyError)):
            decode_jpeg(good[:cut])


# hypothesis property: the encode→decode roundtrip holds for ANY
# geometry (1×1 up through several MCUs, multiples of 8 and ragged),
# any bin-center content, grey and RGB, with and without 4:2:0
from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    mode=st.sampled_from(["grey", "rgb", "rgb420"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_property(h, w, mode, seed):
    from common_survey_data_pipeline_spark.operators.jpeg import decode_jpeg

    if mode == "grey":
        px = _bin_center_pixels(h, w, 1, seed=seed)
        payload = encode_jpeg(px)
    elif mode == "rgb":
        px = _bin_center_pixels(h, w, 3, seed=seed)
        payload = encode_jpeg(px)
    else:
        # constant-chroma RGB so 2x2 averaging stays lossless
        lum = _bin_center_pixels(h, w, 1, seed=seed).astype(np.float64)
        px = np.stack([lum, lum, lum], axis=-1).astype(np.uint8)
        payload = encode_jpeg(px, subsample_420=True)
    got_w, got_h, feats = decode_jpeg(payload)
    assert (got_w, got_h) == (w, h)
    assert feats == _expected_hist(px)


def test_sample_frames_null_payload_emits_no_rows(spark):
    """NULL payloads emit no frames (regression: F.least skips NULLs,
    so a byte-less payload used to emit max_frames phantom rows)."""
    from common_survey_data_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, bytearray(200)), (2, None)], "doc_id long, payload binary"
    )
    out = sample_frames(df, every_n_bytes=64, max_frames=8).collect()
    assert {r["doc_id"] for r in out} == {1}
    assert len(out) == 4  # offsets 0, 64, 128, 192 for the 200-byte payload
