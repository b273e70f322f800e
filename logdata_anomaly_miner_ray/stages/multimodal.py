"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``binary`` columns with typed
metadata; decode / feature-extract stages are actor-pool
``map_batches`` with SMALL batch sizes (payloads are MBs — batch ×
concurrency must fit worker heaps; see ray_guide.md memory notes).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so ``decode_fn`` is stubbed: ``DeterministicFakeDecoder`` produces
seeded, content-hash-derived feature vectors (stable across runs →
testable plumbing), and ``CodecDecoder`` raises NotImplementedError
until a real codec is injected. The Ray-side contract — schema,
batch size, actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


class DeterministicFakeDecoder:
    """Actor-pool decode stub: 'decodes' each payload into a
    ``feat_dim`` float32 feature vector derived from its sha256 —
    deterministic, so downstream stages (ANN, dedup, stats) are
    testable end-to-end without codecs."""

    def __init__(self, feat_dim: int = 16):
        self.feat_dim = feat_dim

    def _features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feat_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        feats = [self._features(payloads[i].as_py() or b"") for i in range(len(payloads))]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "features": pa.array(feats, pa.list_(pa.float32(), self.feat_dim)),
                "n_bytes": pa.array(
                    [len(payloads[i].as_py() or b"") for i in range(len(payloads))],
                    pa.int64(),
                ),
            }
        )


class CodecDecoder:
    """Real-codec decode stage — STUB. The image/audio libraries are
    not installed in this container; inject a ``decode_fn(payload,
    kind) -> np.ndarray`` when they are."""

    def __init__(self, decode_fn=None):
        if decode_fn is None:
            raise NotImplementedError(
                "no media codec available in this environment; pass "
                "decode_fn=... (e.g. PIL/ffmpeg-based) or use "
                "DeterministicFakeDecoder for plumbing tests"
            )
        self.decode_fn = decode_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.decode_fn(batch["payload"][i].as_py(), batch["kind"][i].as_py())
            for i in range(len(batch))
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


def decode_media(
    ds: "ray.data.Dataset",
    decoder_cls=DeterministicFakeDecoder,
    batch_size: int = 64,
    concurrency=(1, 8),
    **decoder_kwargs,
) -> "ray.data.Dataset":
    """Actor-pool decode stage. Small batch_size on purpose: payload
    bytes × batch_size × concurrency is the resident-set bound."""
    if decoder_kwargs:
        import functools

        decoder = functools.partial(decoder_cls, **decoder_kwargs)
    else:
        decoder = decoder_cls
    return ds.map_batches(
        decoder,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["application/octet-stream"] * n, pa.string()),
            "width": pa.array(rng.integers(16, 1920, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 1080, n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 60000, n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class ResizeStage:
    """Actor-pool image-resize stage — plumbing real, kernel stubbed
    (no PIL in the container): output rows carry the target
    ``width``/``height`` and a payload whose length is exactly
    ``width·height·3`` bytes, produced deterministically from the
    input bytes (truncate/cycle) so tests can assert the contract.
    Inject ``resize_fn(payload, w, h) -> bytes`` for a real codec."""

    def __init__(self, width: int, height: int, resize_fn=None):
        self.width, self.height = width, height
        self.resize_fn = resize_fn

    def _fake(self, payload: bytes) -> bytes:
        need = self.width * self.height * 3
        if not payload:
            return b"\x00" * need
        reps = -(-need // len(payload))
        return (payload * reps)[:need]

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = self.resize_fn or self._fake
        payloads = batch["payload"]
        out = [fn(payloads[i].as_py() or b"", ) if self.resize_fn is None
               else fn(payloads[i].as_py() or b"", self.width, self.height)
               for i in range(len(payloads))]
        n = len(batch)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out, pa.large_binary()),
                "width": pa.array([self.width] * n, pa.int32()),
                "height": pa.array([self.height] * n, pa.int32()),
            }
        )


def resize_images(
    ds: "ray.data.Dataset", width: int, height: int,
    batch_size: int = 16, concurrency=(1, 8), resize_fn=None,
) -> "ray.data.Dataset":
    """Image resize as a SMALL-batch actor pool (payloads are MBs:
    batch × concurrency sized to worker heaps)."""
    return ds.map_batches(
        ResizeStage, fn_constructor_args=(width, height, resize_fn),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def sample_frames(
    ds: "ray.data.Dataset", every_ms: int = 1000,
    batch_size: int = 8, concurrency: int = 8,
) -> "ray.data.Dataset":
    """Video frame sampling: one output row per sampled timestamp
    (``duration_ms // every_ms`` frames, t = k·every_ms). Row
    explosion happens inside ``map_batches`` (never on the driver);
    the stubbed frame payload is a deterministic slice of the input
    bytes (a real decoder would seek; the slice keeps byte-level
    lineage testable). Non-video rows are dropped."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, fidx, tms, frames = [], [], [], []
        kinds = batch["kind"].to_pylist()
        durs = batch["duration_ms"].to_pylist()
        payloads = batch["payload"]
        for i in range(len(batch)):
            if kinds[i] != "video" or not durs[i]:
                continue
            payload = payloads[i].as_py() or b""
            n_frames = max(int(durs[i]) // every_ms, 1)
            chunk = max(len(payload) // n_frames, 1)
            mid = batch["media_id"][i].as_py()
            for k in range(n_frames):
                ids.append(mid)
                fidx.append(k)
                tms.append(k * every_ms)
                frames.append(payload[k * chunk : (k + 1) * chunk])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "t_ms": pa.array(tms, pa.int32()),
                "frame": pa.array(frames, pa.large_binary()),
            }
        )

    return ds.map_batches(
        explode, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def extract_image_metadata(
    ds: "ray.data.Dataset", payload_col: str = "payload"
) -> "ray.data.Dataset":
    """REAL codec-free metadata: image format + dimensions parsed
    from container headers (functions/media.image_dims — PNG/GIF/BMP
    vectorized fixed offsets, JPEG bounded marker walk). Plain tasks,
    full blocks: header parsing touches only the first bytes of each
    payload, so the image-payload small-batch rule for DECODE stages
    does not apply here."""
    from ..functions.media import image_dims

    def fn(batch: pa.Table) -> pa.Table:
        fmt, w, h = image_dims(batch[payload_col])
        out = batch.drop_columns([payload_col])
        return (
            out.append_column("format", fmt)
            .append_column("img_width", w)
            .append_column("img_height", h)
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def stdlib_image_decode(payload: bytes, kind: str) -> np.ndarray:
    """REAL decode_fn for ``CodecDecoder``: PNG/BMP payloads decode
    with the stdlib-only codecs (functions/media.decode_image — zlib
    + numpy, no PIL) into the fixed 11-dim pixel-feature vector
    (dims, per-channel means, stds). Raises ValueError on formats
    that genuinely need an external codec (JPEG/video) — the
    injectable contract is unchanged, it just has a working default
    for the formats the standard library can express."""
    from ..functions.media import decode_image, image_pixel_features

    if kind != "image":
        raise ValueError(f"stdlib codec decodes images only, got {kind!r}")
    return image_pixel_features(decode_image(payload))


def stdlib_image_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize_fn for ``ResizeStage``: decode (PNG/BMP) →
    nearest-neighbor index-map resize → re-encode PNG (filter 0).
    Deterministic end-to-end; byte-exact across runs and workers."""
    from ..functions.media import decode_image, encode_png, resize_nearest

    return encode_png(resize_nearest(decode_image(payload), width, height))


def decode_images_stdlib(
    ds: "ray.data.Dataset", batch_size: int = 64, concurrency=(1, 8),
) -> "ray.data.Dataset":
    """Actor-pool image decode with the REAL stdlib codec (PNG/BMP):
    rows whose payload can't be decoded (JPEG, truncated bytes,
    non-image kinds) are emitted with null features and ``decode_ok
    = false`` rather than failing the pipeline — at corpus scale a
    poison payload must never kill a block."""

    class Decode:
        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..functions.media import decode_image, image_pixel_features

            payloads = batch["payload"]
            kinds = batch["kind"].to_pylist()
            feats, ok = [], []
            for i in range(len(payloads)):
                try:
                    if kinds[i] != "image":
                        raise ValueError("not an image row")
                    feats.append(image_pixel_features(
                        decode_image(payloads[i].as_py() or b"")).tolist())
                    ok.append(True)
                except Exception:  # poison payloads: flag, never fail
                    feats.append(None)
                    ok.append(False)
            return pa.table({
                "media_id": batch["media_id"],
                "features": pa.array(feats, pa.list_(pa.float32(), 11)),
                "decode_ok": pa.array(ok, pa.bool_()),
            })

    return ds.map_batches(
        Decode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)
