"""Codec-free image header parsing: real formats, real offsets."""

import struct

import numpy as np
import pyarrow as pa

import ray.data as rd

from logdata_anomaly_miner_ray.functions.media import image_dims
from logdata_anomaly_miner_ray.stages.multimodal import extract_image_metadata


def png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"\x00" * 8
    )


def gif(w, h, ver=b"9"):
    return b"GIF8" + ver + b"a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def bmp(w, h):
    return (
        b"BM" + struct.pack("<IHHI", 60, 0, 0, 54)
        + struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 30
    )


def jpeg(w, h, exif_first=True):
    soi = b"\xff\xd8"
    exif = b"\xff\xe1" + struct.pack(">H", 10) + b"Exif\x00\x00ab"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x03\x01\x11\x00"
    body = (exif + sof0) if exif_first else (sof0 + exif)
    return soi + body + b"\xff\xd9"


def test_image_dims_all_formats():
    payloads = [
        png(640, 480),
        gif(13, 37),
        gif(1, 2, ver=b"7"),
        bmp(800, 600),
        bmp(10, 10),
        jpeg(1920, 1080),
        jpeg(320, 240, exif_first=False),
        b"GIF8Xa\x00\x00\x00\x00",  # bad version byte
        b"\xff\xd8\xff",  # truncated jpeg
        b"not an image at all",
        b"",
    ]
    fmt, w, h = image_dims(pa.array(payloads, pa.binary()))
    assert fmt.to_pylist() == [
        "png", "gif", "gif", "bmp", "bmp", "jpeg", "jpeg",
        "unknown", "jpeg", "unknown", "unknown",
    ]
    assert w.to_pylist() == [640, 13, 1, 800, 10, 1920, 320, None, None, None, None]
    assert h.to_pylist() == [480, 37, 2, 600, 10, 1080, 240, None, None, None, None]


def test_bmp_topdown_negative_height():
    raw = (
        b"BM" + struct.pack("<IHHI", 60, 0, 0, 54)
        + struct.pack("<IiiHH", 40, 33, -44, 1, 24) + b"\x00" * 30
    )
    fmt, w, h = image_dims(pa.array([raw], pa.binary()))
    assert (fmt[0].as_py(), w[0].as_py(), h[0].as_py()) == ("bmp", 33, 44)


def test_extract_image_metadata_stage(ray_session):
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array([png(4, 5), jpeg(6, 7), b"junk"], pa.binary()),
        }
    )
    out = (
        extract_image_metadata(rd.from_arrow(t))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert list(out["format"]) == ["png", "jpeg", "unknown"]
    assert list(out["img_width"].fillna(-1).astype(int)) == [4, 6, -1]
    assert "payload" not in out.columns


def test_image_dims_fuzz_never_raises():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.binary(min_size=0, max_size=64), min_size=0, max_size=8))
    def run(payloads):
        fmt, w, h = image_dims(pa.array(payloads, pa.binary()))
        assert len(fmt) == len(payloads)
        # dims are null whenever format is unknown
        for f, wv in zip(fmt.to_pylist(), w.to_pylist()):
            if f == "unknown":
                assert wv is None

    run()


# ---- stdlib PNG/BMP codec ----


def _rand_img(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a if ch > 1 else a[:, :, 0][:, :, None]


def test_png_roundtrip_all_filters_and_channels():
    from logdata_anomaly_miner_ray.functions.media import decode_png, encode_png

    for ch in (1, 3, 4):
        img = _rand_img(13, 7, ch, seed=ch)
        for f in range(5):
            back = decode_png(encode_png(img, filter_type=f))
            assert back.shape == img.shape, (ch, f)
            assert np.array_equal(back, img), (ch, f)


def test_png_gradient_smooth_image_filters():
    """Smooth gradients exercise filters 3/4 where predictions are
    non-trivial (random data makes predictors near-useless)."""
    from logdata_anomaly_miner_ray.functions.media import decode_png, encode_png

    y, x = np.mgrid[0:24, 0:17]
    img = np.stack([(y * 3 + x) % 256, (y + x * 5) % 256,
                    (y * y // 4 + x) % 256], axis=2).astype(np.uint8)
    for f in (3, 4):
        assert np.array_equal(decode_png(encode_png(img, filter_type=f)), img)


def test_bmp_roundtrip_and_padding():
    from logdata_anomaly_miner_ray.functions.media import decode_bmp, encode_bmp

    for w in (5, 6, 7, 8):  # hits every 4-byte padding case
        img = _rand_img(9, w, 3, seed=w)
        back = decode_bmp(encode_bmp(img))
        assert np.array_equal(back, img), w


def test_decode_image_dispatch_and_rejects():
    import pytest

    from logdata_anomaly_miner_ray.functions.media import (
        decode_image, encode_bmp, encode_png)

    img = _rand_img(4, 4, 3, seed=1)
    assert np.array_equal(decode_image(encode_png(img)), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 not really jpeg")


def test_resize_nearest_exact_indices():
    from logdata_anomaly_miner_ray.functions.media import resize_nearest

    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    # floor(i*4/8) duplicates each source pixel 2x2
    assert np.array_equal(up[::2, ::2], img)
    assert np.array_equal(up[1::2, 1::2], img)
    down = resize_nearest(img, 2, 2)
    assert np.array_equal(down, img[::2, ::2])


def test_stdlib_codec_in_multimodal_stages():
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from logdata_anomaly_miner_ray.functions.media import (
        decode_png, encode_bmp, encode_png)
    from logdata_anomaly_miner_ray.stages.multimodal import (
        decode_images_stdlib, resize_images, stdlib_image_resize)

    imgs = [_rand_img(10, 8, 3, seed=i) for i in range(4)]
    payloads = [encode_png(imgs[0]), encode_bmp(imgs[1]),
                b"not an image", encode_png(imgs[3])]
    t = pa.table({
        "media_id": pa.array(range(4), pa.int64()),
        "kind": pa.array(["image", "image", "image", "video"], pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
    })
    ds = rd.from_arrow(t)
    # null-bearing list columns break Ray's to_pandas tensor cast
    # (CLAUDE.md) — read arrow batches
    batches = list(decode_images_stdlib(ds).iter_batches(
        batch_format="pyarrow"))
    out = pa.concat_tables(batches).to_pandas().sort_values("media_id")
    assert out["decode_ok"].tolist() == [True, True, False, False]
    f0 = np.array(out.iloc[0]["features"])
    assert f0[0] == 10 and f0[1] == 8 and f0[2] == 3
    assert abs(f0[3] - imgs[0][:, :, 0].mean()) < 1e-3

    # real resize_fn end-to-end: output payload is a valid PNG of the
    # target dims with nearest-neighbor pixels
    rs = resize_images(
        rd.from_arrow(t.slice(0, 2)), 4, 5,
        resize_fn=stdlib_image_resize).to_pandas()
    dec = decode_png(rs.iloc[0]["payload"])
    assert dec.shape == (5, 4, 3)
