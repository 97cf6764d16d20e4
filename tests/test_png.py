"""Real PNG codec (multimodal.encode_png / decode_png — RFC 2083 with
stdlib zlib + numpy): roundtrips across color types and every scanline
filter, palette expansion, subset rejections, and the decode_image
dispatch."""

import numpy as np
import pytest

from lucene_spark.multimodal import (
    decode_image,
    decode_png,
    encode_png,
)


def _img(h, w, ch, seed=0):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_roundtrip_all_filters(ch, filt):
    img = _img(13, 7, ch, seed=ch * 10 + filt)
    got = decode_png(encode_png(img, filter_type=filt))
    if ch == 1:
        want = np.repeat(img[:, :, None], 3, axis=2)
    elif ch == 4:
        want = img[:, :, :3]
    else:
        want = img
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_known_pixels_no_filter():
    # hand-checkable 2x2 RGB
    img = np.array([[[255, 0, 0], [0, 255, 0]],
                    [[0, 0, 255], [10, 20, 30]]], dtype=np.uint8)
    data = encode_png(img)
    assert data.startswith(b"\x89PNG\r\n\x1a\n")
    np.testing.assert_array_equal(decode_png(data), img)


def test_palette_png():
    """Build a color-type-3 PNG by hand: 4-entry palette, 2x2 indices."""
    import struct
    import zlib

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    idx = bytes([0, 0, 1, 0, 2, 3])  # filter0 + row(0,1); filter0 + row(2,3)

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
               + chunk(b"PLTE", plte)
               + chunk(b"IDAT", zlib.compress(idx))
               + chunk(b"IEND", b""))
    got = decode_png(payload)
    want = np.array([[[255, 0, 0], [0, 255, 0]],
                     [[0, 0, 255], [9, 9, 9]]], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_adam7_interlaced_roundtrip(filt):
    img = _img(21, 13, 3, seed=50 + filt)
    np.testing.assert_array_equal(
        decode_png(encode_png(img, filter_type=filt, interlaced=True)), img)


@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (5, 5), (8, 1), (9, 9)])
def test_adam7_tiny_images_with_empty_passes(h, w):
    img = _img(h, w, 3, seed=h * 10 + w)
    np.testing.assert_array_equal(
        decode_png(encode_png(img, interlaced=True, filter_type=1)), img)


def test_16bit_depth_scales_to_hi_byte():
    rng = np.random.RandomState(8)
    img16 = rng.randint(0, 65536, (9, 7, 3)).astype(np.uint16)
    want = (img16 >> 8).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_png(encode_png(img16, bit_depth=16)), want)
    np.testing.assert_array_equal(
        decode_png(encode_png(img16, bit_depth=16, interlaced=True,
                              filter_type=4)), want)


def test_subset_rejections():
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    # sub-byte depth (4-bit palette) remains a documented subset rejection
    p4 = (b"\x89PNG\r\n\x1a\n"
          + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 4, 3, 0, 0, 0))
          + chunk(b"PLTE", bytes(48))
          + chunk(b"IDAT", zlib.compress(b"\x00\x01"))
          + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png(p4)
    with pytest.raises(ValueError):
        decode_png(b"nope")


def test_decode_image_dispatch_png_and_jpeg():
    img = _img(5, 4, 3, seed=7)
    np.testing.assert_array_equal(decode_image(encode_png(img)), img)
    # real baseline JPEG now routes through lucene_spark.jpeg
    from lucene_spark.jpeg import encode_jpeg

    smooth = np.tile(np.arange(0, 160, 10, dtype=np.uint8)[None, :, None],
                     (8, 1, 3))
    out = decode_image(encode_jpeg(smooth, quality=95))
    assert out.shape == smooth.shape
    assert np.abs(out.astype(int) - smooth.astype(int)).max() <= 4
    # a truncated/garbage JPEG still raises, never returns the fake
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0fakejpeg")


def test_image_features_over_png_column(spark):
    """The Spark mapInPandas kernel consumes real PNG payloads end-to-end."""
    from lucene_spark.multimodal import image_features

    rows = [(i, bytearray(encode_png(_img(16, 16, 3, seed=i), filter_type=i % 5)))
            for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = image_features(df).toPandas().sort_values("doc_id")
    assert len(out) == 8
    assert (out.width == 16).all() and (out.height == 16).all()
    for i, feat in zip(out.doc_id, out.feature):
        img = _img(16, 16, 3, seed=int(i)).mean(axis=2)
        ys = np.linspace(0, 15, 8).astype(int)
        want = img[np.ix_(ys, ys)].ravel() / 255.0
        np.testing.assert_allclose(np.array(feat), want, atol=1e-12)
