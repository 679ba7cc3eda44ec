"""Baseline + progressive JPEG decoder
(operators/multimodal.py::_decode_jpeg).

The fixture generator is tests/jpeg_encoder.py — an independent
implementation of the FORWARD transforms from ITU-T T.81 (direct
double-sum DCT, canonical code assignment from the spec text), so the
round-trip cannot cancel a mirrored bug in the decoder's matrix IDCT
or Huffman walk. Progressive (SOF2) coverage pins EXACT pixel
equality against the baseline encoding of the same image (identical
quantization on both encoder paths → identical coefficients once all
scans land). The NotImplementedError boundary retreats to
arithmetic/lossless/hierarchical.
"""

from __future__ import annotations

import numpy as np
import pytest

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.multimodal import (
    _decode_jpeg,
    extract_features,
    image_near_dup_pairs,
    perceptual_hashes,
)

from .jpeg_encoder import encode_jpeg, encode_jpeg_progressive


def _gradient(h=24, w=24):
    g = np.linspace(40, 200, h * w).reshape(h, w)
    return np.stack([g, g * 0.8 + 10, 255 - g], axis=2).astype(np.uint8)


def test_solid_color_roundtrips_exactly():
    """A solid mid-gray image is DC-only with zero quantization error:
    decode(encode(x)) must be EXACT, pixel for pixel."""
    solid = np.full((16, 16, 3), 128, dtype=np.uint8)
    assert (_decode_jpeg(encode_jpeg(solid)) == solid).all()


def test_smooth_image_high_quality_tolerance():
    img = _gradient()
    dec = _decode_jpeg(encode_jpeg(img, quality_scale=0.1))
    assert dec.shape == img.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_non_multiple_of_8_dimensions():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(21, 19, 3), dtype=np.uint8)
    dec = _decode_jpeg(encode_jpeg(img, quality_scale=0.25))
    assert dec.shape == (21, 19, 3)  # padding cropped back off


def test_grayscale_single_component():
    dec = _decode_jpeg(encode_jpeg(_gradient(), grayscale=True,
                                   quality_scale=0.1))
    assert dec.shape == (24, 24, 3)
    assert (dec[:, :, 0] == dec[:, :, 1]).all()
    assert (dec[:, :, 1] == dec[:, :, 2]).all()


def test_restart_markers_do_not_change_pixels():
    img = _gradient()
    with_rst = _decode_jpeg(encode_jpeg(img, quality_scale=0.1, restart=2))
    without = _decode_jpeg(encode_jpeg(img, quality_scale=0.1))
    assert (with_rst == without).all()


@pytest.mark.parametrize("subsample", [(2, 2), (1, 2)])
def test_chroma_subsampling(subsample):
    """4:2:0 / 4:2:2 exercise the multi-block MCU layout and the
    chroma upsample path; luma stays near-exact, chroma within the
    box-down/nearest-up budget."""
    img = _gradient()
    dec = _decode_jpeg(
        encode_jpeg(img, quality_scale=0.1, subsample=subsample)
    )
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def test_scan_component_order_is_irrelevant():
    """T.81 leaves the SOS component order to the writer; plane
    assignment must go by COMPONENT ID, not scan position — a decoder
    keyed on scan position color-swaps on a (Cr, Cb, Y) scan."""
    img = _gradient()
    normal = _decode_jpeg(encode_jpeg(img, quality_scale=0.1))
    for order in [(2, 1, 0), (1, 2, 0), (0, 2, 1)]:
        swapped = _decode_jpeg(
            encode_jpeg(img, quality_scale=0.1, sos_order=order)
        )
        assert (swapped == normal).all(), order


def test_undefined_tables_raise_corrupt_jpeg():
    """Missing DHT/DQT for a referenced selector is the corrupt-JPEG
    ValueError contract, not a bare KeyError."""
    data = encode_jpeg(_gradient(), quality_scale=0.1)
    # retarget the luma DQT to table id 2: table 0 becomes undefined
    no_qt = data.replace(b"\xff\xdb\x00\x43\x00", b"\xff\xdb\x00\x43\x02", 1)
    with pytest.raises(ValueError, match="undefined quant table"):
        _decode_jpeg(no_qt)
    # retarget the luma DC DHT to id 2: DC selector 0 becomes undefined
    no_dht = data.replace(b"\xff\xc4\x00\x1f\x00", b"\xff\xc4\x00\x1f\x02", 1)
    with pytest.raises(ValueError, match="undefined Huffman table"):
        _decode_jpeg(no_dht)


def test_arithmetic_rejected_and_mislabeled_progressive_corrupt():
    data = encode_jpeg(_gradient())
    with pytest.raises(NotImplementedError, match="baseline"):
        _decode_jpeg(data.replace(b"\xff\xc0", b"\xff\xc9", 1))
    # flipping a BASELINE stream's SOF marker to SOF2 yields a
    # progressive file whose scan header (Ss=0, Se=63) is illegal —
    # corrupt, loudly, not a silent mis-decode
    with pytest.raises(ValueError, match="corrupt"):
        _decode_jpeg(data.replace(b"\xff\xc0", b"\xff\xc2", 1))


# ------------------------------------------------ progressive (SOF2)


@pytest.mark.parametrize("quality_scale", [1.0, 0.1])
def test_progressive_matches_baseline_exactly(quality_scale):
    """encode_jpeg_progressive quantizes identically to encode_jpeg,
    so once every scan lands the decoder must produce the SAME pixels
    — exact equality, no tolerance. Exercises interleaved DC first +
    refinement, per-component spectral bands, two successive-
    approximation levels, and cross-block EOB runs."""
    img = _gradient()
    base = _decode_jpeg(encode_jpeg(img, quality_scale=quality_scale))
    prog = _decode_jpeg(
        encode_jpeg_progressive(img, quality_scale=quality_scale)
    )
    assert (prog == base).all()


def test_progressive_random_odd_size_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(21, 19, 3), dtype=np.uint8)
    base = _decode_jpeg(encode_jpeg(img, quality_scale=0.25))
    prog = _decode_jpeg(encode_jpeg_progressive(img, quality_scale=0.25))
    assert prog.shape == (21, 19, 3)
    assert (prog == base).all()


def test_progressive_grayscale_exact():
    img = _gradient()
    base = _decode_jpeg(encode_jpeg(img, grayscale=True, quality_scale=0.1))
    prog = _decode_jpeg(
        encode_jpeg_progressive(img, grayscale=True, quality_scale=0.1)
    )
    assert (prog == base).all()


@pytest.mark.parametrize("subsample", [(2, 2), (1, 2)])
def test_progressive_subsampled_exact(subsample):
    """Subsampled progressive: interleaved DC scans cover the padded
    MCU grid while per-component AC scans cover each component's OWN
    block grid (T.81 A.2.2) — the geometry split that breaks naive
    decoders."""
    img = _gradient()
    base = _decode_jpeg(
        encode_jpeg(img, quality_scale=0.1, subsample=subsample)
    )
    prog = _decode_jpeg(
        encode_jpeg_progressive(img, quality_scale=0.1, subsample=subsample)
    )
    assert (prog == base).all()


def test_progressive_restart_markers_exact():
    """RSTn inside progressive scans reset DC predictors AND the EOB
    run; pixels must be identical to the unrestarted encoding."""
    img = _gradient()
    plain = _decode_jpeg(encode_jpeg_progressive(img, quality_scale=0.1))
    rst = _decode_jpeg(
        encode_jpeg_progressive(img, quality_scale=0.1, restart=2)
    )
    assert (rst == plain).all()


def test_progressive_long_eob_runs_exact():
    """A nearly-solid image makes most AC bands all-zero, driving EOB
    runs far past 1 (EOBn with extension bits) — the cross-block run
    path a per-block EOB0 fixture would never reach."""
    solid = np.full((64, 64, 3), 130, dtype=np.uint8)
    solid[5, 5] = [200, 40, 90]
    base = _decode_jpeg(encode_jpeg(solid))
    prog = _decode_jpeg(encode_jpeg_progressive(solid))
    assert (prog == base).all()


def test_progressive_custom_scan_script_exact():
    """Any spec-legal scan script must converge to the same pixels:
    three successive-approximation levels and fine-grained spectral
    bands, refinements interleaved across components."""
    img = _gradient()
    script = [
        ((0, 1, 2), 0, 0, 0, 2),
        ((0,), 1, 2, 0, 3),
        ((1,), 1, 63, 0, 2),
        ((2,), 1, 63, 0, 2),
        ((0,), 3, 20, 0, 3),
        ((0, 1, 2), 0, 0, 2, 1),
        ((0,), 21, 63, 0, 3),
        ((0,), 1, 63, 3, 2),
        ((1,), 1, 63, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((2,), 1, 63, 2, 1),
        ((0,), 1, 63, 2, 1),
        ((1,), 1, 63, 1, 0),
        ((2,), 1, 63, 1, 0),
        ((0,), 1, 63, 1, 0),
    ]
    base = _decode_jpeg(encode_jpeg(img, quality_scale=0.1))
    prog = _decode_jpeg(
        encode_jpeg_progressive(img, quality_scale=0.1, scan_script=script)
    )
    assert (prog == base).all()


def test_truncated_payload_fails_loudly():
    with pytest.raises(ValueError):
        _decode_jpeg(b"\x89PNG not a jpeg")


def _media_rows(spark, images):
    rows = [
        (
            mid,
            "image",
            bytearray(encode_jpeg(px, quality_scale=0.1)),
            (px.shape[1], px.shape[0], None, None, "jpeg"),
        )
        for mid, px in images
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary,"
        " meta struct<width:int,height:int,sample_rate:int,"
        "n_frames:int,format:string>",
    )


def test_jpeg_near_twin_found_by_image_near_dup_pairs(spark):
    """The r6 VERDICT acceptance: a planted JPEG near-twin pair is
    found by the perceptual-hash + hamming-banding chain; an unrelated
    JPEG is not paired."""
    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[0:2, 0:2] = 255  # tiny corner blotch
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    media = _media_rows(spark, [(1, base), (2, near), (3, other)])

    hashes = {
        r.media_id: r.dhash for r in perceptual_hashes(media).collect()
    }
    assert len(hashes) == 3 and all(v is not None for v in hashes.values())
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_near_dup_pairs(media).collect()
    }
    assert (1, 2) in pairs
    assert all({a, b} == {1, 2} for a, b in pairs)


def test_progressive_near_twin_found_by_image_near_dup_pairs(spark):
    """The r7 VERDICT acceptance: a PROGRESSIVE re-encode of a
    baseline JPEG is a perceptual near-twin — the dedup chain must
    pair them across codecs (decode path differs, pixels agree)."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(encode_jpeg(base, quality_scale=0.1)),
         (32, 32, None, None, "jpeg")),
        (2, "image",
         bytearray(encode_jpeg_progressive(base, quality_scale=0.1)),
         (32, 32, None, None, "jpeg")),
        (3, "image", bytearray(encode_jpeg(other, quality_scale=0.1)),
         (32, 32, None, None, "jpeg")),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary,"
        " meta struct<width:int,height:int,sample_rate:int,"
        "n_frames:int,format:string>",
    )
    pairs = {
        (r.doc_a, r.doc_b) for r in image_near_dup_pairs(media).collect()
    }
    assert (1, 2) in pairs
    assert all({a, b} == {1, 2} for a, b in pairs)


def test_extract_features_decodes_jpeg(spark):
    img = _gradient()
    media = _media_rows(spark, [(7, img)])
    row = extract_features(media, decoder="real").collect()[0]
    assert row.media_id == 7
    # feature vector layout: [w, h, mean_r, mean_g, mean_b, ...]
    assert row.features[0] == 24.0 and row.features[1] == 24.0
    assert abs(row.features[2] - img[:, :, 0].mean()) < 2.0


@pytest.mark.parametrize("shape", [(21, 19), (17, 33), (9, 9)])
@pytest.mark.parametrize("subsample", [(2, 2), (2, 1)])
def test_subsampled_odd_dimensions(shape, subsample):
    """Subsampling + non-multiple-of-MCU dimensions: the encoder pads
    planes to the MCU grid, the decoder crops back — shapes must
    round-trip and errors stay within the chroma-downsample budget."""
    g = np.linspace(30, 220, shape[0] * shape[1]).reshape(shape)
    img = np.stack([g, 255 - g, g * 0.5 + 40], axis=2).astype(np.uint8)
    dec = _decode_jpeg(
        encode_jpeg(img, quality_scale=0.1, subsample=subsample)
    )
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 20
