"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata.

The decode step is STUBBED in this container (no PIL/ffmpeg/librosa):
``fake=True`` (default) produces a DETERMINISTIC fake decode (pixel
buffer seeded from the payload hash) so the Ray-side plumbing —
schema, actor-pool signature, batch sizing, output layout — is real
and tested; ``fake=False`` raises ``NotImplementedError`` unless the
real codec import succeeds. Swap the ``_decode_*_real`` bodies when
codecs are available.

Batch-size guidance: large binary payloads need SMALL ``batch_size``
(payload_bytes x batch_size x concurrency must fit the worker heap) —
pass batch_size explicitly from the caller; defaults here assume
<= ~1 MiB payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from totem_ray.hashing import splitmix64

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # 'image' | 'audio' | 'video'
    ("payload", pa.large_binary()),
    ("width", pa.int32()),            # typed metadata (nullable)
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("n_frames", pa.int32()),
])


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)
    px = splitmix64(np.arange(h * w * 3, dtype=np.uint64) + seed)
    return (px & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, 3)


class DecodeImage:
    """Actor-pool stage: (media rows) -> decoded pixel features.

    __init__ loads the codec ONCE per actor (or arms the fake);
    __call__ decodes a batch. Output: (media_id, height, width,
    mean_r, mean_g, mean_b) — swap the feature tail for a model head
    as needed.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake
        if not fake:
            try:
                from PIL import Image  # noqa: F401
                self._pil = Image
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "real image decode needs PIL; not in this container "
                    "— use fake=True") from e

    def _decode(self, payload: bytes, h: int, w: int) -> np.ndarray:
        if self.fake:
            return _fake_pixels(payload, h or 32, w or 32)
        import io  # pragma: no cover
        return np.asarray(self._pil.open(io.BytesIO(payload)))  # pragma: no cover

    def __call__(self, t: pa.Table) -> pa.Table:
        # metadata columns vectorized once per batch; only the payload
        # loop is per-row (inherent to per-item decode)
        payloads = t["payload"].to_pylist()
        mh = t["height"].to_pylist()
        mw = t["width"].to_pylist()
        hs, ws, means = [], [], []
        for i in range(t.num_rows):
            if payloads[i] is None:   # missing media: null features
                hs.append(None)
                ws.append(None)
                means.append((None, None, None))
                continue
            px = self._decode(payloads[i], mh[i], mw[i])
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            means.append(tuple(px.reshape(-1, 3).mean(axis=0)))
        return pa.table({
            "media_id": t["media_id"].combine_chunks()
            if isinstance(t["media_id"], pa.ChunkedArray) else t["media_id"],
            "height": pa.array(hs, type=pa.int32()),
            "width": pa.array(ws, type=pa.int32()),
            "mean_r": pa.array([m[0] for m in means], type=pa.float64()),
            "mean_g": pa.array([m[1] for m in means], type=pa.float64()),
            "mean_b": pa.array([m[2] for m in means], type=pa.float64()),
        })


class ResizeImage:
    """Actor-pool stage: decoded-or-fake pixels -> nearest-neighbor
    resize -> re-encoded payload (fake: raw bytes). Demonstrates the
    binary-in/binary-out stage layout."""

    def __init__(self, out_h: int = 16, out_w: int = 16, fake: bool = True):
        self.out_h, self.out_w, self.fake = out_h, out_w, fake
        if not fake:
            raise NotImplementedError("real resize needs a codec; "
                                      "use fake=True in this container")

    def __call__(self, t: pa.Table) -> pa.Table:
        out = []
        payloads = t["payload"].to_pylist()
        mh = t["height"].to_pylist()
        mw = t["width"].to_pylist()
        for i in range(t.num_rows):
            if payloads[i] is None:   # missing media: null output row
                out.append(None)
                continue
            px = _fake_pixels(payloads[i], mh[i] or 32, mw[i] or 32)
            ys = (np.arange(self.out_h) * px.shape[0] // self.out_h)
            xs = (np.arange(self.out_w) * px.shape[1] // self.out_w)
            small = px[ys][:, xs]
            out.append(small.tobytes())
        return pa.table({
            "media_id": t["media_id"],
            "payload": pa.array(out, type=pa.large_binary()),
            "height": pa.array([self.out_h] * t.num_rows, type=pa.int32()),
            "width": pa.array([self.out_w] * t.num_rows, type=pa.int32()),
        })


class SampleFrames:
    """Actor-pool stage for 'video' rows: sample ``every_n``-th frame;
    fake frames = equal byte slices of the payload. Output one row per
    sampled frame (media_id, frame_idx, frame_payload)."""

    def __init__(self, every_n: int = 10, fake: bool = True):
        self.every_n = every_n
        if not fake:
            raise NotImplementedError("real frame sampling needs ffmpeg; "
                                      "use fake=True in this container")

    def __call__(self, t: pa.Table) -> pa.Table:
        # video rows only: image/audio rows carry n_frames = null and
        # used to yield one bogus whole-payload "frame" each
        if "media_type" in t.column_names:
            t = t.filter(pc.equal(t["media_type"], "video"))
        ids, idxs, frames = [], [], []
        payloads = t["payload"].to_pylist()
        nf = t["n_frames"].to_pylist()
        mids = t["media_id"].to_pylist()
        for i in range(t.num_rows):
            if nf[i] is None or payloads[i] is None:
                continue
            n = max(int(nf[i]), 1)
            buf = payloads[i]
            step = max(len(buf) // n, 1)
            for f in range(0, n, self.every_n):
                ids.append(mids[i])
                idxs.append(f)
                frames.append(buf[f * step:(f + 1) * step])
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(idxs, type=pa.int32()),
            "frame_payload": pa.array(frames, type=pa.large_binary()),
        })


def decode_images(media, batch_size: int = 64, concurrency=(1, 4),
                  fake: bool = True):
    return media.map_batches(DecodeImage, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency,
                             fn_constructor_kwargs={"fake": fake})


def resize_images(media, out_h: int = 16, out_w: int = 16,
                  batch_size: int = 64, concurrency=(1, 4)):
    return media.map_batches(ResizeImage, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency,
                             fn_constructor_kwargs={"out_h": out_h,
                                                    "out_w": out_w})


def sample_frames(media, every_n: int = 10, batch_size: int = 16,
                  concurrency=(1, 4)):
    return media.map_batches(SampleFrames, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency,
                             fn_constructor_kwargs={"every_n": every_n})


def synthetic_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ["media_id", "media_type", "payload", "width",
                            "height", "sample_rate", "n_frames"]}
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 2048)),
                               dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["media_type"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(32 if kind == "image" else None)
        rows["height"].append(24 if kind == "image" else None)
        rows["sample_rate"].append(16000 if kind == "audio" else None)
        rows["n_frames"].append(30 if kind == "video" else None)
    return pa.table({
        "media_id": pa.array(rows["media_id"], type=pa.int64()),
        "media_type": pa.array(rows["media_type"], type=pa.string()),
        "payload": pa.array(rows["payload"], type=pa.large_binary()),
        "width": pa.array(rows["width"], type=pa.int32()),
        "height": pa.array(rows["height"], type=pa.int32()),
        "sample_rate": pa.array(rows["sample_rate"], type=pa.int32()),
        "n_frames": pa.array(rows["n_frames"], type=pa.int32()),
    })
