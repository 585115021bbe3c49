"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (per the project north star): media travels as an opaque
``binary`` column plus a metadata struct; decode / feature-extract /
resize / frame-sample are Arrow-batched ``mapInPandas`` stages. The
decode kernel has two profiles: a REAL codec — built-in pure
stdlib+numpy PNG (zlib inflate + filter reconstruction) and BMP
decoders, with PIL as the fallback for other formats when installed —
and a deterministic fake (pure function of the payload bytes) that the
SQL oracle can mirror; registry queries pin correctness on the fake
profile, ``tests/test_multimodal_codec.py`` exercises the real one.

At 100 TB the pattern is: payloads stay columnar in Parquet, pipelines
``repartition`` by size-balanced key before the pandas stage so Arrow
batches are uniform, and extracted features (small) flow onward while
payloads are dropped as early as possible (column pruning does this for
free when the downstream plan never references the payload).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), False),
        StructField("declared_width", IntegerType(), True),
        StructField("declared_height", IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal-shaped table from a text table for testing:
    payload = utf-8 bytes of the text, metadata struct marks it as a
    fake image. Real pipelines read payloads from Parquet binary
    columns directly."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.lit(None).cast("int").alias("declared_width"),
            F.lit(None).cast("int").alias("declared_height"),
        ).alias("meta"),
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# PNG color type → samples per pixel (8-bit depth, non-interlaced only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw, width: int, height: int, ch: int):
    """Reverse PNG scanline filtering (types 0-4: None/Sub/Up/Average/
    Paeth) → (height, width*ch) uint8 sample matrix. Up/None vectorize;
    Sub/Average/Paeth carry a per-pixel left dependency, so those rows
    run a short Python loop over x — rows are independent, and in the
    ``mapInPandas`` deployment each Arrow batch decodes in parallel
    across partitions, which is where the scale comes from."""
    import numpy as np

    stride = width * ch
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            row += prev
        elif ftype in (1, 3, 4):
            for x in range(stride):
                a = int(row[x - ch]) if x >= ch else 0  # left (reconstructed)
                if ftype == 1:  # Sub
                    row[x] = (int(row[x]) + a) & 0xFF
                    continue
                b = int(prev[x])  # up
                if ftype == 3:  # Average
                    row[x] = (int(row[x]) + ((a + b) >> 1)) & 0xFF
                    continue
                c = int(prev[x - ch]) if x >= ch else 0  # up-left
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row
    return out


def _decode_png(payload: bytes) -> tuple[int, int, list[float]]:
    """Pure stdlib+numpy PNG decode (8-bit grey/RGB/grey-A/RGBA,
    non-interlaced): chunk walk → IHDR geometry → zlib-inflate IDAT →
    unfilter → 8-bin sample histogram as the feature vector."""
    import struct
    import zlib

    import numpy as np

    pos = len(_PNG_MAGIC)
    width = height = None
    ch = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG profile unsupported by the built-in codec "
                    f"(depth={depth}, color={color}, interlace={interlace})"
                )
            ch = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    samples = _png_unfilter(zlib.decompress(bytes(idat)), width, height, ch)
    hist = np.bincount(samples.reshape(-1) >> 5, minlength=8).astype("float64")
    hist /= max(samples.size, 1)
    return int(width), int(height), [round(float(h), 6) for h in hist]


def _decode_bmp(payload: bytes) -> tuple[int, int, list[float]]:
    """Uncompressed 24/32-bit BMP decode (BITMAPINFOHEADER), stdlib+
    numpy: rows are 4-byte aligned, bottom-up unless height < 0."""
    import struct

    import numpy as np

    if len(payload) < 54:
        raise ValueError("malformed BMP: truncated header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP profile unsupported by the built-in codec "
            f"(bpp={bpp}, compression={compression})"
        )
    height = abs(height)
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    px = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, : width * bytes_pp]
    hist = np.bincount(px.reshape(-1) >> 5, minlength=8).astype("float64")
    hist /= max(px.size, 1)
    return int(width), int(height), [round(float(h), 6) for h in hist]


def _decode_image_real(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decode path: built-in pure-numpy codecs for PNG, BMP and
    baseline JPEG (no third-party dependency), PIL for anything else
    when installed. The deterministic fake remains the ORACLE profile —
    this path is for pipelines carrying actual image bytes."""
    if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        try:
            return decode_jpeg(payload)
        except NotImplementedError:
            # profile outside the built-in baseline codec (progressive,
            # 12-bit, CMYK, non-interleaved, fractional sampling): fall
            # through to PIL when installed instead of failing the stage
            pass
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "payload profile needs pillow (absent here): either a "
            "non-PNG/BMP/JPEG format or a JPEG outside the built-in "
            "baseline codec's profile; or use the deterministic fake "
            "(decode_images(..., use_fake=True))"
        ) from exc
    import io

    import numpy as np

    with Image.open(io.BytesIO(payload)) as im:  # pragma: no cover - needs PIL
        arr = np.asarray(im.convert("RGB"))
        hist = np.bincount(arr.reshape(-1) >> 5, minlength=8).astype("float64")
        hist /= max(arr.size, 1)
        return im.width, im.height, [round(float(h), 6) for h in hist]


def _decode_image_fake(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: dimensions derived from payload length,
    features = 8-bin byte histogram (normalized). Pure function of the
    bytes — stable across runs/partitions."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    hist = [0] * 8
    for by in payload:
        hist[by >> 5] += 1
    total = float(n) or 1.0
    return width, height, [round(h / total, 6) for h in hist]


def decode_images(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    use_fake: bool = True,
    batch_hint: int | None = None,
) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    ``mapInPandas`` so each Arrow batch is processed vectorized-ish in
    Python while the surrounding plan stays columnar. With
    ``use_fake=False`` raises NotImplementedError unless PIL is
    available (it is not in this container — clearly-marked stub).
    """
    decode = _decode_image_fake if use_fake else _decode_image_real
    # corrupt rows (null payload/id) are dropped, not crashed on — at
    # ingest scale they are a certainty, and a decode stage must be
    # total over its input
    media = media.where(
        F.col(payload_col).isNotNull() & F.col(id_col).isNotNull()
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "payload_bytes": payloads.map(len).astype("int64"),
            }
            decoded = [decode(p) for p in payloads]
            out["width"] = pd.Series([d[0] for d in decoded], dtype="int32")
            out["height"] = pd.Series([d[1] for d in decoded], dtype="int32")
            out["features"] = pd.Series([d[2] for d in decoded], dtype="object")
            yield pd.DataFrame(out)

    src = media.select(F.col(id_col), F.col(payload_col))
    if batch_hint:
        src = src.repartition(batch_hint)
    return src.mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("out_width", IntegerType(), True),
        StructField("out_height", IntegerType(), True),
    ]
)


def resize_images(
    decoded: DataFrame,
    target: int = 128,
    use_fake: bool = True,
) -> DataFrame:
    """Aspect-preserving resize plumbing (fit longest side to
    ``target``). The real kernel would transform pixel buffers (PIL —
    absent here, clearly-marked stub); the fake computes the output
    geometry in pure integer math so it is exactly mirrorable in the
    SQL oracle: ``out = max(1, dim * target // max(w, h))``.

    Arrow-batched ``mapInPandas`` like the decode stage — at scale this
    is where the pixel work would be, so the plumbing (batch iteration,
    schema, vectorized geometry) is the real contract being tested.
    """
    if not use_fake:
        raise NotImplementedError(
            "real resize requires pillow; this container stubs the kernel"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            longest = pdf[["width", "height"]].max(axis=1).clip(lower=1)
            out_w = (pdf["width"] * target // longest).clip(lower=1)
            out_h = (pdf["height"] * target // longest).clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pdf["width"].astype("int32"),
                    "height": pdf["height"].astype("int32"),
                    "out_width": out_w.astype("int32"),
                    "out_height": out_h.astype("int32"),
                }
            )

    return decoded.select("doc_id", "width", "height").mapInPandas(
        batches, RESIZED_SCHEMA
    )


def sample_frames(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing for video-shaped payloads: emit one row
    per sampled offset (the real decoder would emit decoded frames).
    Pure columnar — the sampling plan itself needs no Python.

    NULL payloads emit no frames (same totality policy as
    decode_images/decode_audio) — without the filter, ``F.least``
    skips the NULL length and every byte-less payload would emit
    ``max_frames`` phantom rows."""
    media = media.where(F.col(payload_col).isNotNull())
    offsets = F.transform(
        F.sequence(
            F.lit(0),
            F.least(
                F.floor(F.length(F.col(payload_col)) / every_n_bytes).cast("int"),
                F.lit(max_frames - 1),
            ),
        ),
        lambda i: i * every_n_bytes,
    )
    return media.select(
        F.col(id_col),
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload_bytes", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("peak", LongType(), True),
    ]
)

_AUDIO_RATE = 16_000  # fake profile: PCM16 mono @ 16 kHz


def attach_audio_payload(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic audio-shaped payloads for testing: per id, a PCM16
    little-endian mono square wave of ``16000 + id % 16000`` samples at
    amplitude ``(id % 7 + 1) * 1000`` — synthesized vectorized in an
    Arrow ``mapInPandas`` batch, exactly the real ingest shape (binary
    column + typed metadata struct). The square wave makes downstream
    stats closed-form checkable: rms == amplitude, peak == amplitude.
    """
    import numpy as np

    src = df.select(F.col(id_col).cast("long").alias("doc_id")).where(
        F.col(id_col).isNotNull()
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                n = _AUDIO_RATE + int(i) % _AUDIO_RATE
                amp = (int(i) % 7 + 1) * 1000
                wave = np.full(n, amp, dtype=np.int16)
                wave[1::2] = -amp
                payloads.append(wave.tobytes())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return src.mapInPandas(batches, "doc_id long, payload binary").select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("audio/pcm16").alias("media_type"),
            F.lit(_AUDIO_RATE).alias("sample_rate"),
            F.lit(1).alias("channels"),
        ).alias("meta"),
    )


def decode_audio(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    sample_rate: int = _AUDIO_RATE,
) -> DataFrame:
    """Decode PCM16-mono payloads and compute per-clip stats (sample
    count, duration, RMS, absolute peak) — the audio leg of the
    multimodal surface, same plumbing contract as ``decode_images``:
    Arrow-batched ``mapInPandas``, numpy vectorized per clip, total
    over corrupt rows (null payloads dropped; odd trailing bytes
    truncated as a real PCM reader does).
    """
    import numpy as np

    media = media.where(
        F.col(payload_col).isNotNull() & F.col(id_col).isNotNull()
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(payload)
                samples = np.frombuffer(
                    buf[: len(buf) - (len(buf) % 2)], dtype="<i2"
                )
                n = int(samples.size)
                if n:
                    x = samples.astype(np.float64)
                    rms = float(np.sqrt(np.mean(x * x)))
                    peak = int(np.max(np.abs(x)))
                else:
                    rms, peak = 0.0, 0
                rows.append(
                    (int(i), len(buf), n, n / sample_rate, rms, peak)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "payload_bytes",
                    "n_samples",
                    "duration_s",
                    "rms",
                    "peak",
                ],
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, AUDIO_STATS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Perceptual hashing (pHash) — the bridge between the multimodal stack
# (pixels) and the dedup stack (Hamming-banded signatures).
# ---------------------------------------------------------------------------

PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("phash", LongType(), False),
    ]
)

_PHASH_GRID = 32
_PHASH_KEEP = 8


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (float64): row u, column x is
    ``c(u) * cos(pi * (2x + 1) * u / (2n))`` — the classic pHash
    transform, as a plain matmul so a whole Arrow batch of luma grids
    transforms in one BLAS call (``D @ X @ D.T`` per image, batched
    via einsum)."""
    import numpy as np

    x = np.arange(n, dtype=np.float64)
    u = x.reshape(-1, 1)
    d = np.cos(np.pi * (2.0 * x + 1.0) * u / (2.0 * n))
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return d * np.sqrt(2.0 / n)


def _luma_grid(payload: bytes, grid: int):
    """Deterministic fake luma plane for a payload: bytes tiled
    row-major into a ``grid × grid`` float array (the pixel profile of
    the fake decoder — a REAL pipeline feeds decoded+downscaled luma
    from the PNG/BMP/JPEG codecs here instead; the pHash math is
    identical either way)."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint8)
    need = grid * grid
    reps = -(-need // arr.size)
    return (
        np.tile(arr, reps)[:need].reshape(grid, grid).astype(np.float64)
    )


def phash64_bytes(payload: bytes, grid: int = _PHASH_GRID, keep: int = _PHASH_KEEP) -> int:
    """Reference single-image pHash (driver-side oracle twin of the
    distributed kernel — ``tests/test_phash.py`` recomputes pairs with
    this and asserts parity with the Spark path): luma grid → 2-D DCT →
    top-left ``keep × keep`` coefficient block → drop the DC term →
    each bit = coefficient > median of the block. 63 information bits
    in a 64-bit long (bit 63 is always 0)."""
    import numpy as np

    d = _dct_matrix(grid)
    coeffs = d @ _luma_grid(payload, grid) @ d.T
    block = coeffs[:keep, :keep].ravel()[1:]  # drop DC: it only encodes brightness
    med = float(np.median(block))
    bits = block > med
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out


def phash_images(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = _PHASH_GRID,
    keep: int = _PHASH_KEEP,
) -> DataFrame:
    """Per-image 64-bit perceptual hash (DCT pHash) as an Arrow-batched
    ``mapInPandas`` stage: the whole batch's luma grids stack into one
    ``(B, grid, grid)`` tensor and transform with two batched matmuls
    (``einsum`` over a shared DCT basis), so the Python cost per image
    is two BLAS-backed multiplies plus a median — not a per-pixel
    Python loop. Output ``(doc_id, phash LONG)`` feeds
    ``operators/dedup.py::hamming_band_pairs`` — the same banded
    equi-join engine text SimHash uses, so image near-dup candidate
    generation is never all-pairs.

    Near-duplicate IMAGES (small crops/noise/brightness shifts — here,
    small byte edits of the fake luma profile) agree on most low-
    frequency DCT signs, landing within a few bits of Hamming distance.
    """
    import numpy as np

    d = _dct_matrix(grid)
    media = media.where(
        F.col(payload_col).isNotNull() & F.col(id_col).isNotNull()
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            lumas = np.stack(
                [_luma_grid(p, grid) for p in pdf[payload_col]]
            )
            # (B,g,g) -> (B,g,g): D @ X @ D.T batched over B
            coeffs = np.einsum("ux,bxy,vy->buv", d, lumas, d, optimize=True)
            block = coeffs[:, :keep, :keep].reshape(len(pdf), -1)[:, 1:]
            med = np.median(block, axis=1, keepdims=True)
            bits = block > med
            weights = (1 << np.arange(bits.shape[1], dtype=np.uint64))
            hashes = (bits.astype(np.uint64) * weights).sum(axis=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "phash": hashes.astype("int64"),
                }
            )

    return media.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        batches, PHASH_SCHEMA
    )


def synthetic_luma_payloads(
    df: DataFrame,
    id_col: str = "doc_id",
    group_size: int = 5,
    grid: int = _PHASH_GRID,
) -> DataFrame:
    """Deterministic synthetic image corpus for the pHash pipeline:
    one raw 8-bit luma plane (``grid × grid`` bytes) per row, where
    rows sharing ``id // group_size`` are near-duplicate VARIANTS of a
    group base image — tiny pixel jitter for most variants (pHash
    Hamming ≈ 0-3, the near-dup class) and a heavy overlay for the
    last variant in each group (far, must NOT pair). The container
    ships no image corpus or codecs, so this generator is the honest
    stand-in: payloads really are images (raw luma planes), the pHash
    kernel really runs on pixels, and only the pixels' origin is
    synthetic. Pure function of the id (seeded generators), so the
    driver-side oracle in ``tests/test_phash.py`` regenerates payloads
    bit-identically.

    Base images are built from random LOW-FREQUENCY DCT coefficients
    (inverse-transformed to pixels), giving every group a strong
    low-frequency sign pattern — like real photographs, and unlike
    white noise, whose near-zero coefficients flip sign under any
    perturbation.
    """
    import numpy as np

    d = _dct_matrix(grid)

    def _payload(ident: int) -> bytes:
        group, variant = divmod(int(ident), group_size)
        rng = np.random.default_rng(group)
        coeffs = np.zeros((grid, grid))
        coeffs[:8, :8] = rng.normal(0.0, 60.0, (8, 8))
        coeffs[0, 0] = 900.0  # positive DC: keep pixel range sane
        base = d.T @ coeffs @ d  # inverse of the orthonormal DCT
        img = np.clip(base * 4.0 + 128.0, 0, 255)
        vrng = np.random.default_rng(group * 100_003 + variant)
        if variant == group_size - 1:
            # the far variant: heavy structured overlay, new low-freq content
            over = np.zeros((grid, grid))
            over[:8, :8] = vrng.normal(0.0, 60.0, (8, 8))
            img = np.clip(img + (d.T @ over @ d) * 4.0, 0, 255)
        else:
            # near-dup variant: jitter a spread of pixels by ±8 — lands
            # the pair at Hamming 0-3 WITH occasional boundary cases
            idx = vrng.integers(0, grid * grid, 96)
            flat = img.ravel()
            flat[idx] = np.clip(flat[idx] + vrng.integers(-8, 9, 96), 0, 255)
        return img.astype(np.uint8).tobytes()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [_payload(i) for i in pdf[id_col]],
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return df.select(F.col(id_col)).mapInPandas(batches, schema)
