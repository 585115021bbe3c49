"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (per the project north star): media travels as an opaque
``binary`` column plus a metadata struct; decode / feature-extract /
resize / frame-sample are Arrow-batched ``mapInPandas`` stages. The
image/audio libraries are NOT in this environment, so the actual decode
kernels are STUBBED — gated behind an import-try with a deterministic
fake fallback — while everything Spark-side (schemas, batch iteration,
partition-preserving plumbing, output contracts) is real and tested.

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


def _decode_image_real(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decode path — requires PIL, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode requires pillow; install it or use the "
            "deterministic fake (decode_images(..., use_fake=True))"
        ) from exc
    raise NotImplementedError("real decode not wired in this environment")


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
    Pure columnar — the sampling plan itself needs no Python."""
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
