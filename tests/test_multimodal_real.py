"""Real-codec multimodal tests: the pure-numpy P6 PPM path decodes,
resizes, and featurizes ACTUAL pixels (no fake/digest stand-ins).

Reference parity: the reference keeps media out of scope; this family
is part of the training-data-pipeline extension surface (multimodal
columns as opaque binary + typed metadata, decode as Arrow maps)."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_pr_spark.operators import multimodal
from big_data_pr_spark.tables import load


def _reference_pixels(rid: int) -> np.ndarray:
    w, h = multimodal.ppm_dims(rid)
    px = np.zeros((h, w, 3), dtype=np.uint8)
    px[:, :, 0] = rid % 256
    px[:, :, 1] = np.arange(w, dtype=np.uint8)[None, :]
    px[:, :, 2] = np.arange(h, dtype=np.uint8)[:, None]
    return px


def test_ppm_encode_decode_roundtrip_local():
    for rid in (0, 1, 7, 255, 256, 4095, 99999):
        px = _reference_pixels(rid)
        w, h, back = multimodal.parse_ppm(multimodal.encode_ppm(px))
        assert (h, w, 3) == px.shape
        assert (back == px).all()


def test_parse_ppm_rejects_other_formats():
    with pytest.raises(NotImplementedError, match="PIL"):
        multimodal.parse_ppm(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="P6 PPM"):
        multimodal.parse_ppm(b"\xff\xd8\xff\xe0jpeg")
    with pytest.raises(NotImplementedError, match="maxval"):
        multimodal.parse_ppm(b"P6\n4 4\n65535\n" + b"\0" * 96)
    with pytest.raises(ValueError, match="truncated"):
        multimodal.parse_ppm(b"P6\n4 4\n255\n\0\0\0")


def test_real_decode_matches_synthesized_pixels(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(40)
    payloads = multimodal.synthesize_ppm(docs, "doc_id")
    meta = {r["id"]: r for r in multimodal.decode_images(payloads, real=True).collect()}
    stats = {r["id"]: r for r in multimodal.decode_stats(payloads).collect()}
    assert len(meta) == 40 and len(stats) == 40
    for rid, m in meta.items():
        px = _reference_pixels(rid)
        h, w, _ = px.shape
        assert (m["width"], m["height"], m["mode"]) == (w, h, "RGB")
        s = stats[rid]
        assert s["mean_r"] == rid % 256
        assert s["mean_g"] == (w - 1) / 2
        assert s["mean_b"] == (h - 1) / 2


def test_real_resize_actual_pixels(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(25)
    payloads = multimodal.synthesize_ppm(docs, "doc_id")
    resized = multimodal.resize_payloads(payloads, max_side=16).collect()
    assert len(resized) == 25
    for r in resized:
        px = _reference_pixels(r["id"])
        h, w, _ = px.shape
        longest = max(w, h)
        if longest <= 16:
            exp_w, exp_h = w, h
        else:
            exp_w = max(1, w * 16 // longest)
            exp_h = max(1, h * 16 // longest)
        assert (r["out_width"], r["out_height"]) == (exp_w, exp_h)
        assert max(exp_w, exp_h) <= 16
        # decode the re-encoded payload and check pixel-exact NN resize
        w2, h2, out = multimodal.parse_ppm(bytes(r["payload"]))
        assert (w2, h2) == (exp_w, exp_h)
        ix = np.arange(exp_w) * w // exp_w
        iy = np.arange(exp_h) * h // exp_h
        assert (out == px[iy][:, ix]).all()


def test_real_features_are_pixel_statistics(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(15)
    payloads = multimodal.synthesize_ppm(docs, "doc_id")
    feats = multimodal.extract_features(payloads, real=True).collect()
    assert len(feats) == 15
    for r in feats:
        px = _reference_pixels(r["id"]).reshape(-1, 3).astype("float64")
        vec = r["feature"]
        assert len(vec) == multimodal.FEATURE_DIM
        np.testing.assert_allclose(vec[:3], px.mean(axis=0) / 255.0, rtol=1e-12)
        np.testing.assert_allclose(vec[3:6], px.std(axis=0) / 255.0, rtol=1e-12)
        w, h = multimodal.ppm_dims(r["id"])
        assert vec[6] == w / 256.0 and vec[7] == h / 256.0


# --- real PCM WAV codec ----------------------------------------------------


def test_wav_encode_parse_roundtrip_local():
    for rid in (0, 1, 7, 240, 241, 4095, 99999):
        n, p, a = multimodal.wav_params(rid)
        s = multimodal.triangle_samples(n, p, a)
        sr, n_ch, back = multimodal.parse_wav(multimodal.encode_wav(s))
        assert (sr, n_ch) == (multimodal.WAV_SAMPLE_RATE, 1)
        assert len(back) == n
        assert (back == s).all()
        assert np.abs(s).max() <= 32767  # int16-safe by construction


def test_parse_wav_walks_extra_chunks():
    """A LIST chunk between fmt and data must be skipped (real RIFF
    files carry metadata chunks) — and an odd-sized chunk is padded to
    word alignment."""
    import struct

    s = multimodal.triangle_samples(64, 16, 1000)
    buf = multimodal.encode_wav(s)
    fmt_chunk = buf[12:36]  # 'fmt ' + size + 16-byte body
    data_chunk = buf[36:]
    info = b"INFO\x00"  # odd size 5 → 1 pad byte
    list_chunk = b"LIST" + struct.pack("<I", len(info)) + info + b"\x00"
    body = fmt_chunk + list_chunk + data_chunk
    riff = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    sr, n_ch, back = multimodal.parse_wav(riff)
    assert sr == multimodal.WAV_SAMPLE_RATE and (back == s).all()


def test_parse_wav_rejects_other_formats():
    with pytest.raises(NotImplementedError, match="RIFF"):
        multimodal.parse_wav(b"ID3\x04\x00mp3 payload....")
    with pytest.raises(NotImplementedError, match="audio library"):
        # float-PCM fmt tag (3) inside a valid RIFF envelope
        import struct

        s = multimodal.triangle_samples(16, 16, 100)
        buf = bytearray(multimodal.encode_wav(s))
        struct.pack_into("<H", buf, 20, 3)
        multimodal.parse_wav(bytes(buf))


def test_decimate_halves_and_keeps_even_samples(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(8)
    wav = multimodal.synthesize_wav(docs, "doc_id")
    out = {
        r["id"]: r
        for r in multimodal.decimate_audio(wav, factor=2).collect()
    }
    for rid, row in out.items():
        n, p, a = multimodal.wav_params(rid)
        expect = multimodal.triangle_samples(n, p, a)[::2]
        assert row["n_samples"] == len(expect)
        assert row["out_sample_rate"] == multimodal.WAV_SAMPLE_RATE // 2
        _, _, back = multimodal.parse_wav(bytes(row["payload"]))
        assert (back == expect).all()


# ---------------------------------------------------------------------------
# Animated-PPM video container (concatenated self-delimiting P6 frames)
# ---------------------------------------------------------------------------


def test_video_roundtrip_frame_identity():
    import numpy as np

    from big_data_pr_spark.operators.multimodal import (
        encode_ppm,
        parse_ppm_video,
    )

    f0 = np.full((4, 5, 3), 7, dtype=np.uint8)
    f1 = np.zeros((6, 3, 3), dtype=np.uint8)
    f1[:, :, 2] = 200
    buf = encode_ppm(f0) + encode_ppm(f1)
    frames = parse_ppm_video(buf)
    assert [(w, h) for w, h, _ in frames] == [(5, 4), (3, 6)]
    np.testing.assert_array_equal(frames[0][2], f0)
    np.testing.assert_array_equal(frames[1][2], f1)


def test_video_trailing_garbage_and_truncation_fail_loudly():
    import numpy as np
    import pytest

    from big_data_pr_spark.operators.multimodal import (
        encode_ppm,
        parse_ppm_video,
    )

    good = encode_ppm(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="malformed"):
        parse_ppm_video(good + b"JUNK")
    with pytest.raises(ValueError, match="truncated"):
        parse_ppm_video(good[:-3])


def test_video_sampling_decodes_correct_frames(spark):
    from pyspark.sql import functions as F

    from big_data_pr_spark.operators import multimodal

    ids = spark.range(40, 44).select(F.col("id").alias("doc_id"))
    frames = multimodal.sample_video_frames(
        multimodal.synthesize_ppm_video(ids, "doc_id"), stride=2
    ).collect()
    for r in frames:
        n_frames, w, h = multimodal.video_params(r["id"])
        assert r["n_frames"] == n_frames and r["frame_idx"] % 2 == 0
        assert (r["width"], r["height"]) == (w, h)
        # constant R channel pins WHICH frame was decoded
        assert r["mean_r"] == (r["id"] + 17 * r["frame_idx"]) % 256
