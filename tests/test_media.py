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
