"""Pure stdlib+numpy BASELINE JPEG decoder (ITU-T T.81 / ISO 10918-1,
sequential DCT, Huffman coding) — the third built-in codec next to the
PNG/BMP decoders in ``multimodal.py``, so the real-decode path needs no
third-party dependency for the dominant training-corpus image format.

Supported profile: SOF0/SOF1 (baseline + extended sequential), 8-bit
samples, 1 or 3 components, any integer sampling factors (4:4:4, 4:2:0,
4:2:2, ...), restart markers, multi-table DQT/DHT. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise NotImplementedError —
loud, not wrong.

This is a from-scratch implementation of the public spec; the decode
contract (width, height, 8-bin sample histogram) matches the sibling
codecs. Per-image cost is O(pixels) numpy work plus a Python Huffman
bit loop over the entropy segment — fine for the Arrow-batched
``mapInPandas`` decode stage, where each worker decodes its own batch.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index -> natural (raster) index within the 8x8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 inverse-DCT basis: pixel = M @ coef @ M.T
_IDCT_M = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for u in range(8)
        ]
        for x in range(8)
    ]
)


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (stuffed
    0xFF00 bytes already collapsed by the caller)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("malformed JPEG: entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, n: int) -> int:
    """JPEG sign extension (spec F.2.2.1): an n-bit value with a 0 high
    bit encodes a negative coefficient."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman table: {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("malformed JPEG: invalid Huffman code")


def _decode_block(
    reader: _BitReader,
    dc_tab: dict,
    ac_tab: dict,
    qt: np.ndarray,
    pred: int,
) -> tuple[np.ndarray, int]:
    """One dequantized 8x8 coefficient block (natural order) + new DC
    predictor."""
    zz = np.zeros(64, dtype=np.int64)
    t = _huff_decode(reader, dc_tab)
    pred += _extend(reader.receive(t), t)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("malformed JPEG: AC run past block end")
        zz[k] = _extend(reader.receive(s), s)
        k += 1
    block = np.zeros(64, dtype=np.float64)
    block[ZIGZAG] = zz * qt  # both zz and qt are in zigzag order
    return block.reshape(8, 8), pred


def _idct2(block: np.ndarray) -> np.ndarray:
    return _IDCT_M @ block @ _IDCT_M.T


def _entropy_segments(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``pos`` to the next non-RST marker,
    split at restart markers, with 0xFF00 stuffing collapsed."""
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            i += 2
        elif nxt == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            i += 1
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker: end of scan
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(payload: bytes) -> tuple[int, int, list[float]]:
    """Decode a baseline JPEG; returns (width, height, 8-bin normalized
    sample histogram) — grey samples for 1-component images, RGB
    samples for 3-component YCbCr (same convention as the PNG/BMP
    decoders and the PIL path)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps: list[dict] = []
    width = height = 0
    hmax = vmax = 1
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("malformed JPEG: marker expected")
        # tolerate 0xFF fill bytes before a marker (T.81 B.1.1.2)
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        data = payload[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                i += 1
                if pq:
                    qt = np.frombuffer(
                        data[i : i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                else:
                    qt = np.frombuffer(
                        data[i : i + 64], dtype=np.uint8
                    ).astype(np.int64)
                    i += 64
                qtables[tq] = qt  # zigzag order, as stored
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            precision, height, width, ncomp = struct.unpack_from(
                ">BHHB", data, 0
            )
            if precision != 8:
                raise NotImplementedError(
                    f"JPEG precision {precision} unsupported (baseline is 8)"
                )
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", data, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) unsupported by the built-in "
                "baseline codec"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} unsupported (baseline only)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                bits = list(data[i + 1 : i + 17])
                nsym = sum(bits)
                vals = data[i + 17 : i + 17 + nsym]
                htables[(tc, th)] = _build_huffman(bits, vals)
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            ns = data[0]
            if ns != len(comps):
                # T.81 allows one scan per component (non-interleaved);
                # decoding only the first scan would silently return a
                # luma-only image — stay loud, not wrong
                raise NotImplementedError(
                    f"non-interleaved JPEG scan ({ns} of {len(comps)} "
                    "components) unsupported by the built-in baseline codec"
                )
            scan: list[dict] = []
            for c in range(ns):
                cid, tt = data[1 + 2 * c], data[2 + 2 * c]
                comp = next(cc for cc in comps if cc["id"] == cid)
                # a scan may reference table ids no DHT/DQT segment
                # defined; surface that as the module's uniform
                # 'malformed JPEG' ValueError, not a bare KeyError the
                # decode stage can't classify
                dc_id, ac_id, qt_id = (0, tt >> 4), (1, tt & 0x0F), comp["tq"]
                if dc_id not in htables or ac_id not in htables:
                    raise ValueError(
                        "malformed JPEG: SOS references undefined Huffman "
                        f"table (dc={dc_id[1]}, ac={ac_id[1]})"
                    )
                if qt_id not in qtables:
                    raise ValueError(
                        f"malformed JPEG: SOS references undefined quant table {qt_id}"
                    )
                scan.append(
                    {
                        **comp,
                        "dc": htables[dc_id],
                        "ac": htables[ac_id],
                        "qt": qtables[qt_id],
                    }
                )
            segments, pos = _entropy_segments(payload, pos)
            planes = _decode_scan(
                segments,
                scan,
                width,
                height,
                hmax,
                vmax,
                restart_interval,
            )
            return _finish(planes, scan, width, height, hmax, vmax)
        # APPn / COM / others: skipped via seg_len
    raise ValueError("malformed JPEG: no SOS scan found")


def _decode_scan(
    segments: list[bytes],
    scan: list[dict],
    width: int,
    height: int,
    hmax: int,
    vmax: int,
    restart_interval: int,
) -> list[np.ndarray]:
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux = (width + mcu_w - 1) // mcu_w
    mcuy = (height + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in scan
    ]
    preds = [0] * len(scan)
    seg_idx = 0
    reader = _BitReader(segments[0])
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1  # RST: new segment, byte-aligned, DC reset
            if seg_idx >= len(segments):
                raise ValueError("malformed JPEG: missing restart segment")
            reader = _BitReader(segments[seg_idx])
            preds = [0] * len(scan)
        my, mx = divmod(m, mcux)
        for ci, comp in enumerate(scan):
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    block, preds[ci] = _decode_block(
                        reader, comp["dc"], comp["ac"], comp["qt"], preds[ci]
                    )
                    px = _idct2(block) + 128.0
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    return planes


def _finish(
    planes: list[np.ndarray],
    scan: list[dict],
    width: int,
    height: int,
    hmax: int,
    vmax: int,
) -> tuple[int, int, list[float]]:
    # upsample every component to full MCU-grid resolution, crop to
    # the true geometry
    full = []
    for comp, plane in zip(scan, planes):
        if vmax % comp["v"] or hmax % comp["h"]:
            # legal per T.81 (factors 1-4, no divisibility rule) but the
            # integer np.repeat upsampler below can't express it
            raise NotImplementedError(
                f"non-integer chroma upsampling ratio (component sampling "
                f"{comp['h']}x{comp['v']} vs max {hmax}x{vmax}) unsupported"
            )
        if comp["h"] != hmax or comp["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // comp["v"], axis=0),
                hmax // comp["h"],
                axis=1,
            )
        full.append(plane[:height, :width])
    if len(full) == 1:
        samples = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        samples = np.clip(
            np.round(np.stack([r, g, b], axis=-1)), 0, 255
        ).astype(np.uint8)
    else:
        raise NotImplementedError(
            f"{len(full)}-component JPEG unsupported (grey or YCbCr only)"
        )
    hist = np.bincount(samples.reshape(-1) >> 5, minlength=8).astype(
        "float64"
    )
    hist /= max(samples.size, 1)
    return int(width), int(height), [round(float(h), 6) for h in hist]
