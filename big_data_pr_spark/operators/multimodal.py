"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub: ``real=True`` raises ``NotImplementedError`` (plug
PIL/torchvision/ffmpeg there in production); the default is a
deterministic fake decoder (dimensions/features derived from the
payload digest) so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested end-to-end.

Scale notes: decode is a per-row map over binary batches → no shuffle;
partition count should track input splits (``maxPartitionBytes``), and
batch size via ``spark.sql.execution.arrow.maxRecordsPerBatch`` keeps
executor memory bounded for large blobs. Frame sampling explodes K rows
per video — still narrow.
"""

# NOTE: no `from __future__ import annotations` — pandas-UDF type hints
# must be live objects for PySpark signature inspection.

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "id long, n_bytes int, width int, height int, mode string, sha_hex string"
)
FRAME_SCHEMA = "id long, frame_idx int, offset_ms long"
FEATURE_DIM = 8
FEATURE_SCHEMA = f"id long, feature array<double>"


def attach_payload(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Build an opaque binary payload column (stand-in for image/audio
    bytes) + byte length metadata."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
    )


def _fake_dims(digest: bytes) -> tuple[int, int, str]:
    w = 64 + digest[0] % 192  # deterministic 64-255
    h = 64 + digest[1] % 192
    mode = "RGB" if digest[2] % 2 == 0 else "L"
    return w, h, mode


def decode_images(df: DataFrame, real: bool = False) -> DataFrame:
    """Decode the binary payload to image metadata.

    ``real=True`` is the production hook (PIL.Image.open over the byte
    buffer) — STUB: raises NotImplementedError in this container.
    Default: deterministic fake decode keyed on the SHA-256 digest.
    """
    if real:
        raise NotImplementedError(
            "real image decode needs PIL/torchvision — not in this container; "
            "wire PIL.Image.open(io.BytesIO(payload)) here"
        )

    def batches(it):
        import pandas as pd

        for pdf in it:
            out = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                digest = hashlib.sha256(bytes(payload)).digest()
                w, h, mode = _fake_dims(digest)
                out.append((rid, len(payload), w, h, mode, digest.hex()))
            yield pd.DataFrame(
                out, columns=["id", "n_bytes", "width", "height", "mode", "sha_hex"]
            )

    return df.select("id", "payload").mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, duration_ms: int = 10_000) -> DataFrame:
    """Frame sampling for video payloads: K evenly spaced offsets per
    row (JVM-side explode — the decode of each frame would then go
    through :func:`decode_images`)."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    return df.select(F.col("id"), idx).select(
        "id",
        "frame_idx",
        (F.col("frame_idx") * F.lit(duration_ms // n_frames)).cast("long").alias("offset_ms"),
    )


RESIZE_SCHEMA = (
    "id long, width int, height int, out_width int, out_height int, scale double"
)


def resize_images(
    df: DataFrame, max_side: int = 128, real: bool = False
) -> DataFrame:
    """Resize step over decoded image metadata: aspect-preserving
    downscale so the longest side is ``max_side`` (never upscales).

    ``real=True`` is the production hook (PIL ``Image.resize`` over the
    payload, re-encode) — STUB in this container. The default computes
    the exact output geometry the real resize would produce, from the
    (fake-)decoded dimensions, keeping the pipeline shape — decode →
    resize → feature-extract — runnable and testable end-to-end.
    Arrow-batched like the other steps; per-row map, no shuffle.
    """
    if real:
        raise NotImplementedError(
            "real resize needs PIL — wire Image.open(...).resize(...) here"
        )

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, w, h in zip(pdf["id"], pdf["width"], pdf["height"]):
                scale = min(1.0, max_side / max(int(w), int(h)))
                ow, oh = max(1, round(w * scale)), max(1, round(h * scale))
                rows.append((rid, w, h, ow, oh, round(scale, 6)))
            yield pd.DataFrame(
                rows,
                columns=["id", "width", "height", "out_width", "out_height", "scale"],
            )

    return df.select("id", "width", "height").mapInPandas(
        batches, schema=RESIZE_SCHEMA
    )


def extract_features(df: DataFrame, real: bool = False) -> DataFrame:
    """Feature extraction stub: deterministic 8-dim embedding from the
    payload digest (production hook: any vision/audio encoder via the
    same mapInPandas signature)."""
    if real:
        raise NotImplementedError("real feature extraction needs a model runtime")

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                digest = hashlib.sha256(bytes(payload)).digest()
                vec = [b / 255.0 for b in digest[:FEATURE_DIM]]
                rows.append((rid, vec))
            yield pd.DataFrame(rows, columns=["id", "feature"])

    return df.select("id", "payload").mapInPandas(batches, schema=FEATURE_SCHEMA)
