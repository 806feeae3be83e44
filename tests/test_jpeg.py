"""Baseline JPEG codec: round-trip properties, spec-envelope guards,
and soft-degrade integration — same discipline as the PNG/BMP/WAV
codec tests (encode twin is fixture-grade by design)."""

import struct

import numpy as np
import pytest

from sequali_spark.sources.jpeg import (
    MAX_JPEG_COEFFICIENTS,
    MAX_JPEG_COEFFICIENTS_RELAXED,
    MAX_JPEG_PIXELS,
    decode_jpeg_baseline,
    dct2,
    encode_jpeg_baseline,
    idct2,
)
from sequali_spark.sources.multimodal import decode_payload


def _gradient(h, w):
    x = np.linspace(0, 1, w)
    y = np.linspace(0, 1, h)
    return np.stack(
        [np.outer(y, x) * 255, np.outer(1 - y, x) * 255, np.full((h, w), 128.0)],
        axis=2,
    ).astype(np.uint8)


def test_idct_is_exact_inverse_of_dct():
    rng = np.random.RandomState(0)
    b = rng.rand(8, 8) * 255
    np.testing.assert_allclose(idct2(dct2(b)), b, atol=1e-9)


def test_grayscale_round_trip():
    g = (np.add.outer(np.arange(24), np.arange(40)) * 3 % 256).astype(np.uint8)
    out = decode_jpeg_baseline(encode_jpeg_baseline(g))
    assert out.shape == (24, 40, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).mean() < 4


@pytest.mark.parametrize("h,w", [(8, 8), (33, 50), (17, 9), (1, 1)])
def test_color_round_trip_odd_dims(h, w):
    img = _gradient(h, w)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert out.shape == (h, w, 3)
    # smooth content: error stays at quantization level
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8


def test_restart_interval_round_trip():
    img = _gradient(40, 56)  # 5x7 = 35 MCUs
    plain = decode_jpeg_baseline(encode_jpeg_baseline(img))
    with_rst = decode_jpeg_baseline(encode_jpeg_baseline(img, restart_interval=4))
    # restart markers change the byte stream, not the pixels
    np.testing.assert_array_equal(plain, with_rst)


def test_progressive_sof2_rejected():
    jp = bytearray(encode_jpeg_baseline(_gradient(8, 8)))
    i = jp.find(b"\xff\xc0")
    jp[i + 1] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg_baseline(bytes(jp))


def test_decompression_bomb_guarded_before_alloc():
    jp = bytearray(encode_jpeg_baseline(_gradient(8, 8)))
    i = jp.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) — declare a 60000x60000 image
    struct.pack_into(">HH", jp, i + 5, 60000, 60000)
    with pytest.raises(ValueError, match="MAX_JPEG_PIXELS"):
        decode_jpeg_baseline(bytes(jp))
    assert 60000 * 60000 > MAX_JPEG_PIXELS


def test_coefficient_budget_gates_near_cap_hostile_header():
    """r7 wall-clock envelope (closes ADVICE r5 #3 residue): a header
    UNDER the 16M pixel cap but over the coefficient budget — the
    slow-decode bomb the pixel-only cap priced wrong for 4:4:4 — must
    be refused BEFORE any entropy decoding.  1400x1400 at the encoder's
    4:2:0 layout declares 88x88 MCUs x 6 blocks x 64 = ~2.97M
    coefficients: just past the 2.8M default (near-cap), ~5.3 s of a
    core at the measured 1.8 us/coefficient hostile worst case."""
    jp = bytearray(encode_jpeg_baseline(_gradient(16, 16)))
    i = jp.find(b"\xff\xc0")
    struct.pack_into(">HH", jp, i + 5, 1400, 1400)
    declared = 88 * 88 * 6 * 64
    assert 1400 * 1400 < MAX_JPEG_PIXELS  # the pixel cap alone misses it
    assert MAX_JPEG_COEFFICIENTS < declared < int(MAX_JPEG_COEFFICIENTS * 1.1)
    with pytest.raises(ValueError, match="MAX_JPEG_COEFFICIENTS"):
        decode_jpeg_baseline(bytes(jp))
    # the old envelope stays available as an explicit knob: the gate
    # passes and the decode proceeds to the entropy stage (then fails
    # on the 16x16-sized stream — a DIFFERENT, post-gate error)
    with pytest.raises(ValueError) as ex:
        decode_jpeg_baseline(bytes(jp), max_coefficients=MAX_JPEG_COEFFICIENTS_RELAXED)
    assert "MAX_JPEG_COEFFICIENTS" not in str(ex.value)
    assert declared <= MAX_JPEG_COEFFICIENTS_RELAXED


def test_honest_image_decodes_under_default_budget():
    """A real encoded image well under the budget round-trips through
    the default envelope unchanged (the gate is header-math only)."""
    img = _gradient(64, 48)
    out = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert out.shape == (64, 48, 3)


def test_fill_bytes_before_marker_are_skipped():
    # optional 0xFF fill bytes before a marker are legal (T.81 B.1.1.2)
    jp = encode_jpeg_baseline(_gradient(16, 16))
    i = jp.find(b"\xff\xdb")
    padded = jp[:i] + b"\xff\xff" + jp[i:]
    np.testing.assert_array_equal(
        decode_jpeg_baseline(padded), decode_jpeg_baseline(jp)
    )


def test_multi_scan_rejected_not_half_decoded():
    """A scan header covering fewer components than the SOF declares
    (the non-interleaved multi-scan layout) must raise — a partial
    decode would return confidently wrong (chroma-zeroed) pixels."""
    jp = encode_jpeg_baseline(_gradient(16, 16))
    i = jp.find(b"\xff\xda")
    (old_len,) = struct.unpack(">H", jp[i + 2 : i + 4])
    new_body = bytes([1, 1, 0x00, 0, 63, 0])  # ns=1: luma scan only
    patched = (
        jp[:i]
        + b"\xff\xda"
        + struct.pack(">H", len(new_body) + 2)
        + new_body
        + jp[i + 2 + old_len :]
    )
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg_baseline(patched)


def test_truncated_scan_raises():
    jp = encode_jpeg_baseline(_gradient(32, 32))
    with pytest.raises(ValueError):
        decode_jpeg_baseline(jp[: len(jp) // 2])


def test_decode_payload_routes_jpeg_and_degrades(monkeypatch):
    # force the PIL-less route: with Pillow installed decode_payload
    # prefers PIL ('pil' codec) — this test pins the stdlib path
    import sequali_spark.sources.multimodal as mm

    monkeypatch.setattr(mm, "HAVE_PIL", False)
    jp = encode_jpeg_baseline(_gradient(16, 16))
    codec, feats = decode_payload(jp)
    assert codec == "jpeg-baseline"
    assert feats.shape == (32,) and feats.dtype == np.float32
    # corrupt payload with a JPEG magic must soft-degrade, never raise
    codec2, _ = decode_payload(b"\xff\xd8\xff\xe0garbage-not-a-jpeg")
    assert codec2 == "opaque"


from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@settings(max_examples=25, deadline=None)
@given(
    arrays(
        np.uint8,
        st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(3)),
    )
)
def test_any_rgb_array_round_trips_shape_exact(img):
    """Property: every uint8 HxWx3 array survives encode->decode with
    exact shape/dtype AND a coarse value check — the global mean must
    survive within DC-quantization tolerance (white-noise pixels
    legitimately quantize hard per-pixel, but JPEG preserves block DCs
    to within the quant step, so a garbage/all-zeros decode cannot
    pass)."""
    out = decode_jpeg_baseline(encode_jpeg_baseline(img))
    assert out.shape == img.shape
    assert out.dtype == np.uint8
    assert abs(float(out.mean()) - float(img.mean())) < 24


def test_random_corruption_never_escapes_decode_payload():
    """Flip bytes all over a valid stream: decode_payload must return
    SOME (codec, features) for every corruption — wrong pixels are
    acceptable, exceptions are not (the reference's graceful-degrade
    discipline, util.py:113-123)."""
    rng = np.random.RandomState(5)
    base = bytearray(encode_jpeg_baseline(_gradient(24, 24)))
    for _ in range(60):
        jp = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            jp[rng.randint(2, len(jp))] = rng.randint(0, 256)
        codec, feats = decode_payload(bytes(jp))
        assert feats.shape == (32,)


def test_features_match_png_path_for_same_pixels(monkeypatch):
    """The feature kernel downstream of decode is codec-agnostic: the
    same pixels through the JPEG path give (near-)identical features to
    the lossless PNG path — lossy-compression error only."""
    import sequali_spark.sources.multimodal as mm
    from sequali_spark.sources.multimodal import encode_png

    monkeypatch.setattr(mm, "HAVE_PIL", False)
    img = _gradient(32, 64)
    c_png, f_png = decode_payload(encode_png(img))
    c_jpg, f_jpg = decode_payload(encode_jpeg_baseline(img))
    assert (c_png, c_jpg) == ("png", "jpeg-baseline")
    assert np.abs(f_png - f_jpg).max() < 0.02


def test_decode_features_stage_tags_jpeg(spark):
    """Arrow-stage integration: a jpeg payload in the media frame comes
    out with codec='jpeg-baseline' and a real feature vector."""
    import pandas as pd

    from sequali_spark.sources.multimodal import decode_features

    pdf = pd.DataFrame(
        {
            "media_id": ["j1", "o1"],
            "kind": ["image", "image"],
            "payload": [encode_jpeg_baseline(_gradient(16, 24)), b"unknownmagic"],
            "meta": [
                {"width": 24, "height": 16, "duration_ms": 0, "mime": "image/jpeg"},
                {"width": 0, "height": 0, "duration_ms": 0, "mime": "application/octet-stream"},
            ],
        }
    )
    from sequali_spark.sources.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    got = {r["media_id"]: r["codec"] for r in decode_features(df).collect()}
    # executors import multimodal themselves, so a driver-side HAVE_PIL
    # monkeypatch can't reach them: accept the PIL tag in PIL-equipped
    # environments (this container has no PIL -> 'jpeg-baseline')
    assert got["j1"] in ("jpeg-baseline", "pil")
    assert got["o1"] == "opaque"


def test_decode_payload_plumbs_coefficient_envelope(monkeypatch):
    """ADVICE r7: the pipeline path must expose the decode envelope —
    with the default budget a too-large JPEG soft-degrades to 'opaque',
    and max_jpeg_coefficients (or the SEQUALI_SPARK_JPEG_MAX_COEFFICIENTS
    env knob) widens it so deployments that own their corpus keep
    decoding larger photos."""
    from sequali_spark.sources import jpeg as J
    from sequali_spark.sources import multimodal as M

    if M.HAVE_PIL:
        pytest.skip("PIL path bypasses the stdlib decoder's budget")

    payload = J.encode_jpeg_baseline(_gradient(64, 64))
    assert M.decode_payload(payload)[0] == "jpeg-baseline"
    # shrink the DEFAULT so the honest image trips the gate: the
    # pipeline default now degrades it to opaque...
    monkeypatch.setattr(J, "MAX_JPEG_COEFFICIENTS", 64)
    assert M.decode_payload(payload)[0] == "opaque"
    # ...and the plumbed knob restores the decode
    assert M.decode_payload(payload, max_jpeg_coefficients=10_000_000)[0] == (
        "jpeg-baseline"
    )

    # env-knob resolution (driver-side, see decode_features)
    monkeypatch.setenv("SEQUALI_SPARK_JPEG_MAX_COEFFICIENTS", "relaxed")
    assert M.jpeg_coefficient_budget() == J.MAX_JPEG_COEFFICIENTS_RELAXED
    monkeypatch.setenv("SEQUALI_SPARK_JPEG_MAX_COEFFICIENTS", "123456")
    assert M.jpeg_coefficient_budget() == 123456
    monkeypatch.delenv("SEQUALI_SPARK_JPEG_MAX_COEFFICIENTS")
    assert M.jpeg_coefficient_budget() is None
