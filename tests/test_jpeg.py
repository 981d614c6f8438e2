"""Baseline JPEG codec: numpy round-trips plus cross-verification against
the JVM's javax.imageio (the independent reference implementation that
ships with the JDK) — the same cross-implementation pattern as the Avro OCF
codec tests."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.functions.jpeg import (
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 4) % 256, (xx * 7) % 256, ((yy + xx) * 3) % 256], axis=-1
    ).astype(np.uint8)


def test_roundtrip_solid_color_nearly_exact():
    img = np.full((24, 24, 3), (200, 64, 30), dtype=np.uint8)
    meta = decode_jpeg(encode_jpeg(img, quality=90))
    assert (meta["width"], meta["height"], meta["channels"]) == (24, 24, 3)
    assert meta["format"] == "jpeg"
    for got, want in zip(meta["mean_rgb"], (200, 64, 30)):
        assert abs(got - want) < 1.0


def test_roundtrip_gradient_odd_dims():
    img = _gradient(37, 29)
    dec = decode_jpeg_pixels(encode_jpeg(img, quality=90))
    assert dec.shape == (37, 29, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 2.0


def test_roundtrip_420_subsampling_and_restart_markers():
    img = _gradient(37, 29)
    payload = encode_jpeg(img, quality=90, subsample="4:2:0", restart_interval=2)
    assert b"\xff\xdd" in payload  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))  # RSTn
    dec = decode_jpeg_pixels(payload)
    assert dec.shape == (37, 29, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 4.0


def test_quality_controls_error():
    img = _gradient(40, 40)
    err_hi = np.abs(
        decode_jpeg_pixels(encode_jpeg(img, quality=95)).astype(int) - img.astype(int)
    ).mean()
    err_lo = np.abs(
        decode_jpeg_pixels(encode_jpeg(img, quality=10)).astype(int) - img.astype(int)
    ).mean()
    assert err_hi < err_lo


def test_progressive_raises_and_decode_media_falls_back():
    from smart_data_lake_spark.functions.multimodal import decode_media

    payload = bytearray(encode_jpeg(_gradient(16, 16)))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(payload))
    assert decode_media(bytes(payload))["format"] == "stub"
    # the real path dispatches through decode_media too
    assert decode_media(encode_jpeg(_gradient(16, 16)))["format"] == "jpeg"


def test_truncated_and_garbage_payloads_raise():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan


# ---- cross-verification vs javax.imageio ---------------------------------


def _imageio_decode(spark, payload: bytes):
    """Decode via the JDK's ImageIO; returns (w, h, HxWx3 uint8)."""
    jvm = spark.sparkContext._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytearray(payload))
    img = jvm.javax.imageio.ImageIO.read(stream)
    w, h = img.getWidth(), img.getHeight()
    argb = img.getRGB(0, 0, w, h, None, 0, w)
    arr = np.array(list(argb), dtype=np.int64).reshape(h, w)
    rgb = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=-1
    ).astype(np.uint8)
    return w, h, rgb


def _imageio_encode(spark, pixels: np.ndarray) -> bytes:
    """Encode an RGB array to JPEG via the JDK's ImageIO writer."""
    jvm = spark.sparkContext._jvm
    h, w = pixels.shape[:2]
    img = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    gateway = spark.sparkContext._gateway
    flat = gateway.new_array(jvm.int, h * w)
    px = pixels.astype(np.int64)
    packed = (px[..., 0] << 16) | (px[..., 1] << 8) | px[..., 2]
    for i, v in enumerate(packed.reshape(-1)):
        flat[i] = int(v)
    img.setRGB(0, 0, w, h, flat, 0, w)
    baos = jvm.java.io.ByteArrayOutputStream()
    ok = jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
    assert ok
    return bytes(baos.toByteArray())


def test_imageio_decodes_our_stream_identically(spark):
    """Our encoder's output must be readable by the JDK decoder AND match
    our own decode within IDCT rounding (both decode the same coefficient
    stream; implementations differ only in IDCT arithmetic)."""
    img = _gradient(32, 24)
    payload = encode_jpeg(img, quality=90)  # 4:4:4: no upsample ambiguity
    w, h, java_rgb = _imageio_decode(spark, payload)
    assert (w, h) == (24, 32)
    ours = decode_jpeg_pixels(payload)
    diff = np.abs(java_rgb.astype(int) - ours.astype(int))
    assert diff.mean() < 1.5 and diff.max() <= 4


def test_we_decode_imageio_stream(spark):
    """The JDK encoder (independent tables, its own subsampling choice)
    produces a stream our decoder must read and agree on."""
    img = _gradient(33, 31)
    payload = _imageio_encode(spark, img)
    _, _, java_rgb = _imageio_decode(spark, payload)
    ours = decode_jpeg_pixels(payload)
    assert ours.shape == java_rgb.shape
    # chroma upsampling filters differ (nearest vs smooth) -> loose bound on
    # the mean, tight on luma-dominated overall agreement
    assert np.abs(java_rgb.astype(int) - ours.astype(int)).mean() < 3.0
    meta = decode_jpeg(payload)
    assert (meta["width"], meta["height"]) == (31, 33)


def test_grayscale_jpeg_from_imageio(spark):
    jvm = spark.sparkContext._jvm
    h, w = 24, 16
    img = jvm.java.awt.image.BufferedImage(w, h, 10)  # TYPE_BYTE_GRAY
    raster = img.getRaster()
    for y in range(h):
        for x in range(w):
            raster.setSample(x, y, 0, (x * 16 + y) % 256)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
    payload = bytes(baos.toByteArray())
    meta = decode_jpeg(payload)
    assert meta["channels"] == 1
    assert (meta["width"], meta["height"]) == (w, h)
    ours = decode_jpeg_pixels(payload)
    assert ours.shape == (h, w, 1)
    # compare against ImageIO's own view of its stream
    jimg = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
    jr = jimg.getRaster()
    java_gray = np.array(
        [[jr.getSample(x, y, 0) for x in range(w)] for y in range(h)], dtype=np.int64
    )
    assert np.abs(java_gray - ours[..., 0].astype(int)).max() <= 2


# ---- review-pass regressions ---------------------------------------------


def test_truncated_entropy_data_is_valueerror_and_stub_fallback():
    """Corrupt payloads must surface as ValueError (not IndexError) so
    decode_media returns the stub instead of failing the whole batch."""
    from smart_data_lake_spark.functions.multimodal import decode_media

    payload = encode_jpeg(_gradient(24, 24))
    truncated = payload[: len(payload) // 2]
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg(truncated)
    assert decode_media(truncated)["format"] == "stub"


def test_four_component_cmyk_rejected_not_mangled():
    payload = bytearray(encode_jpeg(_gradient(16, 16)))
    i = payload.index(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) ncomp(1): rewrite ncomp 3 -> 4
    assert payload[i + 9] == 3
    payload[i + 9] = 4
    with pytest.raises(ValueError, match="components"):
        decode_jpeg(bytes(payload))


def test_fill_bytes_before_markers_are_legal():
    """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes."""
    payload = encode_jpeg(_gradient(16, 16), quality=90)
    # insert fill bytes after SOI (before APP0) and before the SOS marker
    i = payload.index(b"\xff\xda")
    padded = payload[:2] + b"\xff\xff" + payload[2:i] + b"\xff" + payload[i:]
    assert np.array_equal(decode_jpeg_pixels(padded), decode_jpeg_pixels(payload))


def test_jpeg_roundtrip_features_distributed(spark, sf_dir):
    """The real codec runs inside mapInPandas; dims are exact functions of
    n_chars and the stream is genuinely JPEG (payload_bytes plausible)."""
    from pyspark.sql import functions as F

    from smart_data_lake_spark.functions.multimodal import jpeg_roundtrip_features

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 100 == 0)
    )
    out = jpeg_roundtrip_features(docs).collect()
    n_chars = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    assert len(out) == len(n_chars) > 0
    for r in out:
        n = n_chars[r["doc_id"]]
        assert r["width"] == 16 + n % 16
        assert r["height"] == 16 + (n // 16) % 16
        assert r["channels"] == 3 and r["format"] == "jpeg"
        assert r["payload_bytes"] > 200  # real entropy-coded stream
