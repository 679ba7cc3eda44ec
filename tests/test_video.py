"""Video near-dup family (operators/multimodal.py): Y4M / raw-MJPEG
container walks over the in-container decoders, per-frame dHash,
bitwise-majority sequence fingerprint, shared hamming banding — the
mm_image_near_dup test pattern applied to the third modality."""

from __future__ import annotations

import numpy as np
import pytest

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.multimodal import (
    _decode_y4m,
    _dhash64,
    _split_mjpeg,
    _video_frames,
    video_fingerprint,
    video_frame_hashes,
    video_near_dup_pairs,
)

MEDIA_DDL = (
    "media_id long, kind string, content binary,"
    " meta struct<width:int,height:int,sample_rate:int,"
    "n_frames:int,format:string>"
)


def _y4m_bytes(frames, cspace="mono"):
    h, w = frames[0].shape[:2]
    out = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A0:0 C{cspace}\n".encode()
    for f in frames:
        out += b"FRAME\n"
        y = f if f.ndim == 2 else f[..., 0]
        out += y.astype(np.uint8).tobytes()
        if cspace.startswith("420"):
            out += bytes((w // 2) * (h // 2) * 2)  # flat chroma
        elif cspace == "444":
            out += bytes(w * h * 2)
    return out


def _rng_frame(rng, h=32, w=32):
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def test_y4m_decode_roundtrip_and_colorspaces():
    rng = np.random.default_rng(7)
    frames = [_rng_frame(rng) for _ in range(3)]
    for cs in ("mono", "420jpeg", "444"):
        got = _decode_y4m(_y4m_bytes(frames, cs))
        assert len(got) == 3
        for orig, dec in zip(frames, got):
            assert dec.shape == (32, 32, 3)
            assert (dec[..., 0] == orig).all()  # luma plane exact
    with pytest.raises(NotImplementedError, match="C411"):
        _decode_y4m(_y4m_bytes(frames, "411"))
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        _decode_y4m(b"not a video")
    with pytest.raises(ValueError, match="truncated"):
        _decode_y4m(_y4m_bytes(frames)[:-10])


def test_mjpeg_walk_reuses_jpeg_decoder():
    from .jpeg_encoder import encode_jpeg

    rng = np.random.default_rng(11)
    fr = [
        np.repeat(_rng_frame(rng, 16, 16)[:, :, None], 3, axis=2)
        for _ in range(2)
    ]
    stream = b"".join(encode_jpeg(f) for f in fr)
    assert len(_split_mjpeg(stream)) == 2
    frames = _video_frames(stream, "mjpeg")
    assert len(frames) == 2 and frames[0].shape[0] == 16
    with pytest.raises(NotImplementedError, match="mp4"):
        _video_frames(stream, "mp4")


def test_frame_hash_sampling_and_passthrough(spark):
    rng = np.random.default_rng(3)
    frames = [_rng_frame(rng) for _ in range(5)]
    rows = [
        (1, "video", bytearray(_y4m_bytes(frames)), (32, 32, None, 5, "y4m")),
        (2, "video", None, (None, None, None, None, "y4m")),  # NULL payload
        (3, "image", bytearray(b"P6..."), (None, None, None, None, "ppm")),
    ]
    media = spark.createDataFrame(rows, MEDIA_DDL)
    got = video_frame_hashes(media, every_n=2).collect()
    assert {(r.media_id, r.frame_idx) for r in got} == {(1, 0), (1, 2), (1, 4)}
    direct = {
        k: _dhash64(np.repeat(f[:, :, None], 3, axis=2))
        for k, f in enumerate(frames)
    }
    assert all(r.fhash == direct[r.frame_idx] for r in got)


def test_majority_fold_outvotes_minority_frame(spark):
    rng = np.random.default_rng(5)
    a = _rng_frame(rng)
    b = _rng_frame(rng)  # unrelated content
    rows = [
        (1, "video", bytearray(_y4m_bytes([a, a, b])), (32, 32, None, 3, "y4m")),
        (2, "video", bytearray(_y4m_bytes([a])), (32, 32, None, 1, "y4m")),
    ]
    media = spark.createDataFrame(rows, MEDIA_DDL)
    out = {r.media_id: r for r in video_fingerprint(media).collect()}
    ha = _dhash64(np.repeat(a[:, :, None], 3, axis=2))
    assert out[2].vfp == ha and out[2].n_frames_hashed == 1
    # 2:1 majority: the b-frame's bits are outvoted wherever a's two
    # votes agree — with bit-ties broken to 0, vfp matches ha exactly
    # on every bit where ha is set (b contributes at most 1 vote)
    ua = ha & ((1 << 64) - 1)
    uv = out[1].vfp & ((1 << 64) - 1)
    assert uv & ua == uv  # fold bits are a subset of a's bits...
    hb = _dhash64(np.repeat(b[:, :, None], 3, axis=2)) & ((1 << 64) - 1)
    assert uv == ua  # ...and exactly a's bits (2 votes > 1.5 always)
    assert out[1].n_frames_hashed == 3


def test_video_near_dup_recall(spark):
    """Planted near-dup videos (same frames re-ordered + one edited
    frame) pair up; an unrelated video does not; hamming matches the
    direct popcount of the fingerprints."""
    rng = np.random.default_rng(13)
    f1, f2, f3 = (_rng_frame(rng) for _ in range(3))
    edited = f3.copy()
    edited[0:2, 0:2] = 255
    other = [_rng_frame(rng) for _ in range(3)]
    rows = [
        (1, "video", bytearray(_y4m_bytes([f1, f2, f3, f1, f2])), (32, 32, None, 5, "y4m")),
        (2, "video", bytearray(_y4m_bytes([f2, f1, edited, f2, f1])), (32, 32, None, 5, "y4m")),
        (3, "video", bytearray(_y4m_bytes(other)), (32, 32, None, 3, "y4m")),
        (4, "video", None, (None, None, None, None, "y4m")),
    ]
    media = spark.createDataFrame(rows, MEDIA_DDL)
    fps = {r.media_id: r.vfp for r in video_fingerprint(media).collect()}
    assert fps[4] is None
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert ham(fps[1], fps[2]) <= 3  # reorder + light edit stays close
    assert ham(fps[1], fps[3]) > 3
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in video_near_dup_pairs(media).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == ham(fps[1], fps[2])
    assert all({a, b} == {1, 2} for a, b in pairs)
