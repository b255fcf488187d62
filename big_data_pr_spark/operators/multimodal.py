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


# --- real PCM WAV codec (pure struct/numpy; no audio library) --------------
#
# The audio counterpart of the P6 PPM path: RIFF/WAVE with 16-bit PCM
# is a pure struct format, so an actual encoder + chunk-walking parser
# run in this container with no codec dependency. Compressed formats
# (MP3/FLAC/Opus) raise NotImplementedError from the parser — that
# raise site is the production hook for soundfile/ffmpeg.

WAV_SAMPLE_RATE = 8000


def wav_params(doc_id: int) -> tuple[int, int, int]:
    """Deterministic synthetic signal parameters, closed-form in the id
    so a SQL oracle recomputes them symbolically: ``(n_samples, period,
    amplitude)`` — 256-496 samples of a triangle wave with period 16-80
    and peak 1000-28076 (int16-safe)."""
    n = 256 + doc_id % 241
    p = 16 + (doc_id * 7) % 65
    a = 1000 + (doc_id % 29) * 967
    return n, p, a


def triangle_samples(n: int, p: int, a: int):
    """Integer triangle wave ``s_i = a - |4a(i mod p)//p - 2a|`` —
    every op is exact int64 arithmetic, so numpy here and a SQL engine
    produce bit-identical samples (no transcendental functions whose
    libm rounding could differ between engines)."""
    import numpy as np

    i = np.arange(n, dtype=np.int64)
    return a - np.abs((4 * a * (i % p)) // p - 2 * a)


def encode_wav(samples, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Serialize int16 mono samples as a canonical 44-byte-header PCM
    WAV (RIFF little-endian)."""
    import struct

    import numpy as np

    data = np.asarray(samples).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,
        2,
        16,
        b"data",
        len(data),
    )
    return hdr + data


def parse_wav(buf: bytes):
    """Parse a PCM WAV → ``(sample_rate, n_channels, int16 sample
    array)`` via a real RIFF chunk walk (not a fixed 44-byte assumption
    — extra chunks like LIST/fact are skipped correctly).

    Raises ``NotImplementedError`` for non-RIFF payloads and for any
    non-PCM ``fmt`` tag (MP3/FLAC/float WAV…) — the production hook
    where soundfile/ffmpeg plug in.
    """
    import struct

    import numpy as np

    buf = bytes(buf)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError(
            f"payload magic {buf[:4]!r} is not RIFF/WAVE — decoding this "
            "format needs an audio library (wire soundfile.read(io.BytesIO("
            "payload)) here); only PCM WAV decodes without one"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_fmt, n_ch, sr, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt}/{bits}-bit is not integer PCM-16 — "
            "needs an audio library"
        )
    samples = np.frombuffer(data, dtype="<i2")
    return sr, n_ch, samples


def synthesize_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM WAV payloads keyed on the id (triangle wave,
    :func:`wav_params`) — Arrow-batched per-row map, no shuffle."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for rid in pdf["id"]:
                rid = int(rid)
                n, p, a = wav_params(rid)
                rows.append((rid, encode_wav(triangle_samples(n, p, a))))
            yield pd.DataFrame(rows, columns=["id", "payload"])

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        batches, schema="id long, payload binary"
    )


AUDIO_META_SCHEMA = (
    "id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms long, peak int, rms double"
)


def decode_audio(df: DataFrame) -> DataFrame:
    """REAL audio decode: payload → sample-level statistics via the PCM
    parser. ``rms`` is exact: the sum of squares stays under 2^53 for
    int16 audio of < 2^21 samples, so the double sqrt is engine-
    reproducible bit-for-bit."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                sr, n_ch, s = parse_wav(bytes(payload))
                s64 = s.astype(np.int64)
                n = len(s)
                rms = float(np.sqrt(float((s64 * s64).sum()) / n)) if n else 0.0
                rows.append(
                    (
                        rid,
                        sr,
                        n_ch,
                        n,
                        n * 1000 // sr,
                        int(np.abs(s64).max()) if n else 0,
                        round(rms, 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_ms",
                    "peak",
                    "rms",
                ],
            )

    return df.select("id", "payload").mapInPandas(batches, schema=AUDIO_META_SCHEMA)


def decimate_audio(df: DataFrame, factor: int = 2) -> DataFrame:
    """Naive decimation (every ``factor``-th sample, no anti-alias
    filter — documented; a real resampler is a scipy.signal swap in
    this UDF body) with re-encode + restat: the audio counterpart of
    the image resize path."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                sr, _, s = parse_wav(bytes(payload))
                out = s[::factor]
                s64 = out.astype(np.int64)
                n = len(out)
                rms = float(np.sqrt(float((s64 * s64).sum()) / n)) if n else 0.0
                rows.append(
                    (
                        rid,
                        encode_wav(out, sr // factor),
                        sr // factor,
                        n,
                        round(rms, 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "payload", "out_sample_rate", "n_samples", "rms"],
            )

    return df.select("id", "payload").mapInPandas(
        batches,
        schema="id long, payload binary, out_sample_rate int, n_samples long, rms double",
    )


# ---------------------------------------------------------------------------
# Video: animated PPM — concatenated self-delimiting P6 frames.
# A REAL container parse (the walker must decode each frame header to
# find the next frame's offset), completing the image (PPM) / audio
# (WAV) / video triple of codec-library-free multimodal paths.
# ---------------------------------------------------------------------------


def video_params(doc_id: int) -> tuple[int, int, int]:
    """(n_frames, width, height) — closed-form in the id (SQL-replayable);
    frame geometry reuses :func:`ppm_dims`."""
    w, h = ppm_dims(doc_id)
    return 3 + doc_id % 4, w, h


def synthesize_ppm_video(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic animated-PPM payloads: frame ``f`` has a constant
    R channel ``(id + 17·f) % 256`` (so each frame's mean_r certifies
    WHICH frame was decoded), G a horizontal 0..w-1 gradient, B a
    vertical 0..h-1 gradient. Arrow-batched narrow map, no shuffle."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for rid in pdf["id"]:
                rid = int(rid)
                n_frames, w, h = video_params(rid)
                frames = []
                for f in range(n_frames):
                    px = np.zeros((h, w, 3), dtype=np.uint8)
                    px[:, :, 0] = (rid + 17 * f) % 256
                    px[:, :, 1] = (np.arange(w, dtype=np.uint8))[None, :]
                    px[:, :, 2] = (np.arange(h, dtype=np.uint8))[:, None]
                    frames.append(encode_ppm(px))
                rows.append((rid, b"".join(frames)))
            yield pd.DataFrame(rows, columns=["id", "payload"])

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        batches, schema="id long, payload binary"
    )


def parse_ppm_video(buf: bytes):
    """Walk the concatenated P6 stream: parse each header, slice its
    raster, continue at the next frame boundary. Returns a list of
    ``(w, h, pixels)``. Raises on trailing garbage or a truncated
    frame — corrupt containers fail loudly, not silently short."""
    import re as _re

    frames = []
    off = 0
    while off < len(buf):
        m = _re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)[ \t]*(?:\r\n|\n|\r| )", buf[off:])
        if not m:
            raise ValueError(f"malformed P6 frame header at offset {off}")
        w, h = int(m.group(1)), int(m.group(2))
        if int(m.group(3)) != 255:
            raise NotImplementedError("only 8-bit frames supported")
        start = off + m.end()
        end = start + w * h * 3
        if end > len(buf):
            raise ValueError(f"truncated frame raster at offset {off}")
        import numpy as np

        px = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=start)
        frames.append((w, h, px.reshape(h, w, 3)))
        off = end
    return frames


def sample_video_frames(df: DataFrame, stride: int = 2) -> DataFrame:
    """Decode every ``stride``-th frame of each video payload (frame
    sampling — the walker still parses EVERY header to find frame
    boundaries, only rasters of skipped frames go undecoded) and emit
    per-frame channel statistics. Arrow-batched, no shuffle; batch
    memory is bounded by one payload's frames at a time."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                frames = parse_ppm_video(bytes(payload))
                for f in range(0, len(frames), stride):
                    w, h, px = frames[f]
                    out.append(
                        (
                            int(rid),
                            len(frames),
                            f,
                            w,
                            h,
                            float(np.mean(px[:, :, 0])),
                            float(np.mean(px[:, :, 1])),
                            float(np.mean(px[:, :, 2])),
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "id",
                    "n_frames",
                    "frame_idx",
                    "width",
                    "height",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                ],
            )

    return df.select("id", "payload").mapInPandas(
        batches,
        schema="id long, n_frames int, frame_idx int, width int, height int, "
        "mean_r double, mean_g double, mean_b double",
    )


def ahash_images(df: DataFrame) -> DataFrame:
    """8x8 average-hash (aHash) from REAL decoded pixels: gray-sum =
    r+g+b per pixel (no /3 — keeps every pooled value an EXACT
    integer ratio so the SQL oracle's closed-form replay is
    bit-identical; the /3 cancels in the threshold comparison),
    average-pooled onto an 8x8 grid (block bx covers x in
    [floor(bx*w/8), floor((bx+1)*w/8)) — integer ranges an oracle
    reproduces), bit k=by*8+bx set when the pooled value exceeds the
    mean of the 64 pooled values, packed as a 16-hex-char string (one
    byte per pixel-row band; string packing sidesteps int64 sign
    overflow on bit 63). The standard cheap perceptual near-dup key
    for image corpora — identical-looking rasters collide, so GROUPING
    replaces the pair join. Arrow-batched narrow map."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            out = []
            for rid, buf in zip(pdf["id"], pdf["payload"]):
                w, h, px = parse_ppm(bytes(buf))
                g3 = px.sum(axis=2, dtype="int64")  # r+g+b, exact ints
                pooled = []
                for by in range(8):
                    ylo, yhi = by * h // 8, (by + 1) * h // 8
                    row = []
                    for bx in range(8):
                        xlo, xhi = bx * w // 8, (bx + 1) * w // 8
                        s = int(g3[ylo:yhi, xlo:xhi].sum())
                        n = (yhi - ylo) * (xhi - xlo)
                        row.append(s / n)  # exact: value is k/2, k int
                    pooled.append(row)
                m = sum(sum(r) for r in pooled) / 64.0  # exact: /2^6
                hex_hash = "".join(
                    "%02x"
                    % sum(1 << bx for bx in range(8) if pooled[by][bx] > m)
                    for by in range(8)
                )
                out.append((int(rid), int(w), int(h), hex_hash))
            yield pd.DataFrame(out, columns=["id", "w", "h", "ahash"])

    return df.mapInPandas(batches, schema="id long, w int, h int, ahash string")
