"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas``.

Two decode paths:

- ``real=True`` — a REAL image codec for binary **P6 PPM** payloads,
  implemented in pure numpy (header parse + ``np.frombuffer`` raster):
  actual pixel decode, nearest-neighbour resize over actual pixels with
  re-encode, and pixel-statistic feature extraction. PPM needs no codec
  library, so this path runs (and is oracle-certified) in this
  container; payloads in any OTHER format (JPEG/PNG/...) raise
  ``NotImplementedError`` from the executor with the PIL/torchvision
  wiring note — that part remains the production hook.
- default (``real=False``) — deterministic fake decoder (dimensions/
  features derived from the payload digest) for opaque payloads whose
  codec is not available, keeping the Spark-side plumbing — schema,
  partitioning, UDF signature, Arrow batch shape — testable end-to-end
  regardless of format.

:func:`synthesize_ppm` builds deterministic P6 payloads (gradient
images whose geometry and channel statistics are closed-form functions
of the id), so the encode → decode → resize round-trip is certified
against a DuckDB oracle computing the same statistics symbolically.

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


# --- real P6 PPM codec (pure numpy; no external image library) -------------

PPM_MAGIC = b"P6"


def ppm_dims(doc_id: int) -> tuple[int, int]:
    """Deterministic synthetic geometry for :func:`synthesize_ppm`:
    width 16-32, height 16-28, both closed-form in the id so a SQL
    oracle can recompute them symbolically."""
    return 16 + doc_id % 17, 16 + (doc_id * 3) % 13


def encode_ppm(pixels) -> bytes:
    """Serialize an ``(h, w, 3) uint8`` array as a binary P6 PPM."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def parse_ppm(buf: bytes):
    """Parse a binary P6 PPM → ``(w, h, (h, w, 3) uint8 array)``.

    Raises ``NotImplementedError`` for any other format — that is the
    production hook where PIL/torchvision/ffmpeg plug in.
    """
    import re

    import numpy as np

    buf = bytes(buf)
    if buf[:2] != PPM_MAGIC:
        raise NotImplementedError(
            f"payload magic {buf[:4]!r} is not P6 PPM — decoding this format "
            "needs PIL/torchvision (wire PIL.Image.open(io.BytesIO(payload)) "
            "here); only PPM decodes without a codec library"
        )
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)[ \t]*(?:\r\n|\n|\r| )", buf)
    if not m:
        raise ValueError("malformed P6 PPM header")
    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        raise NotImplementedError("only 8-bit (maxval 255) PPM is supported")
    if len(buf) - m.end() < w * h * 3:
        raise ValueError("truncated PPM raster")
    px = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=m.end())
    return w, h, px.reshape(h, w, 3)


def synthesize_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic P6 PPM payloads keyed on the id: R is the constant
    ``id % 256``, G is a horizontal 0..w-1 gradient, B a vertical
    0..h-1 gradient — so width/height and every channel mean are
    closed-form functions of the id (mean_g = (w-1)/2, mean_b =
    (h-1)/2) that a SQL oracle recomputes symbolically. Arrow-batched
    per-row map, no shuffle."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for rid in pdf["id"]:
                rid = int(rid)
                w, h = ppm_dims(rid)
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = rid % 256
                px[:, :, 1] = (np.arange(w, dtype=np.uint8))[None, :]
                px[:, :, 2] = (np.arange(h, dtype=np.uint8))[:, None]
                rows.append((rid, encode_ppm(px)))
            yield pd.DataFrame(rows, columns=["id", "payload"])

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        batches, schema="id long, payload binary"
    )


def decode_images(df: DataFrame, real: bool = False) -> DataFrame:
    """Decode the binary payload to image metadata.

    ``real=True`` decodes actual pixels for P6 PPM payloads (pure
    numpy, :func:`parse_ppm`); any other format raises
    ``NotImplementedError`` from the executor — that raise site is the
    production hook for PIL/torchvision. Default: deterministic fake
    decode keyed on the SHA-256 digest (works for any payload bytes).
    """
    if real:

        def real_batches(it):
            import pandas as pd

            for pdf in it:
                out = []
                for rid, payload in zip(pdf["id"], pdf["payload"]):
                    buf = bytes(payload)
                    w, h, _ = parse_ppm(buf)
                    digest = hashlib.sha256(buf).digest()
                    out.append((rid, len(buf), w, h, "RGB", digest.hex()))
                yield pd.DataFrame(
                    out,
                    columns=["id", "n_bytes", "width", "height", "mode", "sha_hex"],
                )

        return df.select("id", "payload").mapInPandas(
            real_batches, schema=IMAGE_META_SCHEMA
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


STATS_SCHEMA = (
    "id long, width int, height int, mean_r double, mean_g double, mean_b double"
)


def decode_stats(df: DataFrame) -> DataFrame:
    """REAL pixel decode for P6 PPM payloads: geometry plus per-channel
    means computed from the actual raster (exact — integer sums in
    float64). Arrow-batched per-row map, no shuffle. This is the
    decode step a quality-filter pipeline runs over an image corpus
    (brightness/blank-image screens); non-PPM payloads raise the
    PIL production-hook ``NotImplementedError``."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                w, h, px = parse_ppm(bytes(payload))
                rows.append(
                    (
                        rid,
                        w,
                        h,
                        round(float(px[:, :, 0].mean()), 6),
                        round(float(px[:, :, 1].mean()), 6),
                        round(float(px[:, :, 2].mean()), 6),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "mean_r", "mean_g", "mean_b"]
            )

    return df.select("id", "payload").mapInPandas(batches, schema=STATS_SCHEMA)


RESIZED_PAYLOAD_SCHEMA = "id long, payload binary, out_width int, out_height int"


def resize_payloads(df: DataFrame, max_side: int = 16) -> DataFrame:
    """REAL resize over actual pixels (P6 PPM): aspect-preserving
    nearest-neighbour downscale so the longest side is ``max_side``
    (never upscales), re-encoded as PPM. Output geometry uses pure
    integer arithmetic — ``ow = max(1, w*max_side // max(w, h))`` —
    so a SQL oracle reproduces it exactly (no float-rounding ties).
    Per-row map, no shuffle; chain into :func:`decode_stats` or
    :func:`extract_features`."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                w, h, px = parse_ppm(bytes(payload))
                longest = max(w, h)
                if longest <= max_side:
                    ow, oh, out = w, h, px
                else:
                    ow = max(1, w * max_side // longest)
                    oh = max(1, h * max_side // longest)
                    ix = np.arange(ow) * w // ow
                    iy = np.arange(oh) * h // oh
                    out = px[iy][:, ix]
                rows.append((rid, encode_ppm(np.ascontiguousarray(out)), ow, oh))
            yield pd.DataFrame(
                rows, columns=["id", "payload", "out_width", "out_height"]
            )

    return df.select("id", "payload").mapInPandas(
        batches, schema=RESIZED_PAYLOAD_SCHEMA
    )


def extract_features(df: DataFrame, real: bool = False) -> DataFrame:
    """Feature extraction: 8-dim embedding per payload.

    ``real=True`` computes actual pixel statistics for P6 PPM payloads
    (channel means and population stds normalized to [0,1], plus
    geometry) — the shape any vision encoder slots into via the same
    mapInPandas signature. Default: deterministic digest-derived fake
    for opaque formats."""
    if real:

        def real_batches(it):
            import pandas as pd

            for pdf in it:
                rows = []
                for rid, payload in zip(pdf["id"], pdf["payload"]):
                    w, h, px = parse_ppm(bytes(payload))
                    ch = px.reshape(-1, 3).astype("float64")
                    means = ch.mean(axis=0) / 255.0
                    stds = ch.std(axis=0) / 255.0
                    vec = [*means.tolist(), *stds.tolist(), w / 256.0, h / 256.0]
                    rows.append((rid, vec))
                yield pd.DataFrame(rows, columns=["id", "feature"])

        return df.select("id", "payload").mapInPandas(
            real_batches, schema=FEATURE_SCHEMA
        )

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
