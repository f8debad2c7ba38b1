"""Multimodal (image/audio/video) actor-pool stages (driver prompt).

The decode libraries (PIL, ffmpeg, torchaudio, …) are NOT in this
container, so the decode kernels are STUBBED — either a clearly-marked
``NotImplementedError`` (real mode) or a deterministic fake (test mode).
Everything Ray-side is REAL and tested: binary columns with typed
metadata, actor-pool ``map_batches`` with per-actor setup in
``__init__``, small batch sizes for large payloads, and a declared
output schema.

Data model: media rows are ``(media_id int64, kind string, payload
binary, meta string/JSON)``; payloads are opaque bytes.  At 100 TB the
payload column dominates — stages keep ``batch_size`` small (payload ×
batch × concurrency must fit the worker heap) and never convert the
binary column to pandas (Arrow end-to-end).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # image | audio | video
        ("payload", pa.binary()),
        ("meta", pa.string()),       # JSON: {width,height,...} / {sample_rate,...}
    ]
)


class ImageDecodeStage:
    """payload → decoded (H, W, C) features. ``fake=True`` derives a
    deterministic pseudo-decode from the payload bytes (shape from meta,
    pixels from a byte-fold) so the plumbing is testable hermetically."""

    def __init__(self, fake: bool = True, thumb: int = 8) -> None:
        self.fake = fake
        self.thumb = thumb
        # real mode would load the codec ONCE per actor here:
        # from PIL import Image; self._codec = Image

    def _decode(self, payload: bytes, meta: dict) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/opencv, not present in this environment; "
                "run with fake=True or install a codec"
            )
        h = int(meta.get("height", 16))
        w = int(meta.get("width", 16))
        buf = np.frombuffer(payload, dtype=np.uint8)
        reps = int(np.ceil(h * w * 3 / max(1, len(buf))))
        return np.tile(buf, reps)[: h * w * 3].reshape(h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, hs, ws = [], [], []
        for payload, meta_s in zip(
            batch["payload"].to_pylist(), batch["meta"].to_pylist()
        ):
            meta = json.loads(meta_s) if meta_s else {}
            img = self._decode(payload, meta)
            t = self.thumb
            # mean-pool to a t×t×3 thumbnail feature (vectorized)
            H, W, _ = img.shape
            ys = (np.arange(t + 1) * H) // t
            xs = (np.arange(t + 1) * W) // t
            thumb = np.array(
                [
                    [img[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean(axis=(0, 1)) for j in range(t)]
                    for i in range(t)
                ],
                dtype=np.float32,
            )
            feats.append(thumb.ravel().tolist())
            hs.append(H)
            ws.append(W)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "height": pa.array(hs, pa.int32()),
                "width": pa.array(ws, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class AudioFrameStage:
    """payload → fixed-rate frame energies. Fake mode folds bytes into
    float frames; real mode raises NotImplementedError (no codec here)."""

    def __init__(self, fake: bool = True, frame_len: int = 256) -> None:
        self.fake = fake
        self.frame_len = frame_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_frames, energies = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if not self.fake:
                raise NotImplementedError("audio decode requires a codec not in this env")
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float32) / 255.0
            n = len(x) // self.frame_len
            fr = x[: n * self.frame_len].reshape(n, self.frame_len) if n else np.zeros((0, self.frame_len), np.float32)
            ids.append(mid)
            n_frames.append(n)
            energies.append(np.sqrt((fr**2).mean(axis=1)).tolist() if n else [])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(n_frames, pa.int32()),
                "frame_energy": pa.array(energies, pa.list_(pa.float32())),
            }
        )


def decode_images(
    ds: rd.Dataset, concurrency: int = 4, batch_size: int = 16, fake: bool = True
) -> rd.Dataset:
    """Actor-pool image decode: setup per actor, small batches (payloads
    are large), Arrow in/out."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_audio(
    ds: rd.Dataset, concurrency: int = 4, batch_size: int = 16, fake: bool = True
) -> rd.Dataset:
    return ds.map_batches(
        AudioFrameStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media_table(n: int = 64) -> pa.Table:
    """Deterministic fake media rows for tests/queries (no external data)."""
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        kind = "image" if i % 2 == 0 else "audio"
        size = 64 + (i * 37) % 512
        payload = bytes(((i * 131 + j * 17) % 256) for j in range(size))
        meta = {"width": 8 + i % 8, "height": 8 + (i * 3) % 8} if kind == "image" else {"sample_rate": 8000}
        ids.append(i)
        kinds.append(kind)
        payloads.append(payload)
        metas.append(json.dumps(meta, sort_keys=True))
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()), "kind": pa.array(kinds),
         "payload": pa.array(payloads, pa.binary()), "meta": pa.array(metas)},
        schema=MEDIA_SCHEMA,
    )
