"""Multimodal (image/audio/video) actor-pool stages (driver prompt).

Round-4: REAL decode is now hermetic for the uncompressed interchange
formats the standard library + numpy can handle without external codecs
— so ``fake=False`` is exercisable and golden-checkable in this
environment:

* **image** — BMP (24-bit BI_RGB, top-down or bottom-up, 4-byte row
  padding) and PPM ``P6`` (binary, comments allowed) → ``(H, W, 3)``
  RGB uint8;
* **audio** — WAV PCM (8/16-bit, any channel count → mono float32 in
  [-1, 1]) via the stdlib ``wave`` module;
* **video** — a stream of concatenated ``P6`` frames (the raw
  interchange shape ``ffmpeg -f image2pipe -vcodec ppm`` emits) with
  stride-based frame sampling.

Compressed formats (JPEG/PNG/MP3/MP4…) still raise a clearly-marked
``NotImplementedError`` — they genuinely need codecs this container
lacks.  ``fake=True`` keeps the deterministic byte-fold pseudo-decode
for plumbing tests.  Everything Ray-side is real either way: binary
columns with typed metadata, actor-pool ``map_batches`` with per-actor
setup in ``__init__``, small batch sizes for large payloads, declared
output schemas, and the thumbnail mean-pool is one vectorized
``np.add.reduceat`` pass per image (no per-cell Python).

Data model: media rows are ``(media_id int64, kind string, payload
binary, meta string/JSON)``; payloads are opaque bytes.  At 100 TB the
payload column dominates — stages keep ``batch_size`` small (payload ×
batch × concurrency must fit the worker heap) and never convert the
binary column to pandas (Arrow end-to-end).
"""

from __future__ import annotations

import io
import json
import wave

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


# ----------------------------------------------------------------- codecs
def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) RGB uint8 → 24-bit BI_RGB bottom-up BMP bytes."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pix = rows.tobytes()
    off = 14 + 40
    head = (
        b"BM"
        + (off + len(pix)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(pix).to_bytes(4, "little")
        + (2835).to_bytes(4, "little", signed=True)
        + (2835).to_bytes(4, "little", signed=True)
        + (0).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
    )
    return head + pix


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (H, W, 3) RGB uint8 (numpy only)."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP decodes hermetically (bpp={bpp}, "
            f"compression={comp}); other variants need a codec"
        )
    top_down, H = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(buf, np.uint8, count=stride * H, offset=off).reshape(H, stride)
    px = arr[:, : w * 3].reshape(H, w, 3)[:, :, ::-1]  # BGR → RGB
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _ppm_header(buf: bytes, pos: int = 0) -> tuple[int, int, int]:
    """Parse one P6 header starting at ``pos`` (whitespace + ``#`` comment
    tolerant); returns (width, height, pixel_data_offset)."""
    if buf[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    i, vals = pos + 2, []
    while len(vals) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        vals.append(int(buf[i:j]))
        i = j
    if vals[2] != 255:
        raise NotImplementedError("only maxval=255 PPMs decode hermetically")
    return vals[0], vals[1], i + 1  # single whitespace after maxval


def decode_ppm(buf: bytes) -> np.ndarray:
    w, h, off = _ppm_header(buf)
    return np.frombuffer(buf, np.uint8, count=h * w * 3, offset=off).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """float mono in [-1, 1] → 16-bit PCM WAV bytes (stdlib ``wave``)."""
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
    return bio.getvalue()


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM bytes → (mono float32 in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(buf), "rb") as f:
        nch, width, rate, n = f.getnchannels(), f.getsampwidth(), f.getframerate(), f.getnframes()
        raw = f.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM needs a codec (only 8/16-bit here)")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def encode_ppm_stream(frames: list[np.ndarray]) -> bytes:
    """Frames → concatenated-P6 stream (``ffmpeg -f image2pipe`` shape)."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_stream(buf: bytes) -> list[np.ndarray]:
    frames, pos = [], 0
    while pos < len(buf):
        w, h, off = _ppm_header(buf, pos)
        end = off + h * w * 3
        frames.append(np.frombuffer(buf[off:end], np.uint8).reshape(h, w, 3))
        pos = end
    return frames


def _mean_pool(img: np.ndarray, t: int) -> np.ndarray:
    """(H, W, 3) → (t, t, 3) float32 mean-pooled thumbnail, one
    vectorized ``np.add.reduceat`` pass (H, W ≥ t required)."""
    H, W, _ = img.shape
    ys = (np.arange(t + 1) * H) // t
    xs = (np.arange(t + 1) * W) // t
    s = np.add.reduceat(
        np.add.reduceat(img.astype(np.float64), ys[:-1], axis=0), xs[:-1], axis=1
    )
    counts = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    return (s / counts[:, :, None]).astype(np.float32)


def _fold_bytes(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake pseudo-decode: payload bytes tiled to (h, w, 3)."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(h * w * 3 / max(1, len(buf))))
    return np.tile(buf, reps)[: h * w * 3].reshape(h, w, 3)


# ----------------------------------------------------------------- stages
class ImageDecodeStage:
    """payload → (height, width, t×t×3 mean-pool thumbnail feature).
    Real mode dispatches on magic bytes (BMP / P6 PPM — the hermetically
    decodable formats); ``fake=True`` derives a deterministic
    pseudo-decode from the payload bytes (shape from meta)."""

    def __init__(self, fake: bool = True, thumb: int = 8) -> None:
        self.fake = fake
        self.thumb = thumb
        # a real codec-backed variant would load its library ONCE here

    def _decode(self, payload: bytes, meta: dict) -> np.ndarray:
        if self.fake:
            return _fold_bytes(payload, int(meta.get("height", 16)), int(meta.get("width", 16)))
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] == b"P6":
            return decode_ppm(payload)
        raise NotImplementedError(
            "only BMP/PPM decode hermetically; compressed formats need a codec"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, hs, ws = [], [], []
        for payload, meta_s in zip(
            batch["payload"].to_pylist(), batch["meta"].to_pylist()
        ):
            meta = json.loads(meta_s) if meta_s else {}
            img = self._decode(payload, meta)
            H, W, _ = img.shape
            feats.append(_mean_pool(img, self.thumb).ravel().tolist())
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
    """payload → fixed-length frame RMS energies.  Real mode decodes WAV
    PCM (stdlib ``wave``); fake mode folds raw bytes into [0, 1] floats."""

    def __init__(self, fake: bool = True, frame_len: int = 256) -> None:
        self.fake = fake
        self.frame_len = frame_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_frames, rates, energies = [], [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            if self.fake:
                x = np.frombuffer(payload, dtype=np.uint8).astype(np.float32) / 255.0
                rate = 0
            else:
                x, rate = decode_wav(payload)
            n = len(x) // self.frame_len
            fr = (
                x[: n * self.frame_len].reshape(n, self.frame_len)
                if n
                else np.zeros((0, self.frame_len), np.float32)
            )
            ids.append(mid)
            n_frames.append(n)
            rates.append(rate)
            energies.append(np.sqrt((fr**2).mean(axis=1)).tolist() if n else [])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(n_frames, pa.int32()),
                "sample_rate": pa.array(rates, pa.int32()),
                "frame_energy": pa.array(energies, pa.list_(pa.float32())),
            }
        )


class VideoFrameSampleStage:
    """payload → every ``stride``-th frame mean-pooled to a thumbnail
    feature (one output ROW per sampled frame).  Real mode decodes a
    concatenated-P6 stream; fake mode folds bytes into ``n_frames``
    pseudo-frames from meta."""

    def __init__(self, fake: bool = True, stride: int = 4, thumb: int = 4) -> None:
        self.fake = fake
        self.stride = max(1, stride)
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, totals, feats = [], [], [], []
        for mid, payload, meta_s in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta"].to_pylist(),
        ):
            meta = json.loads(meta_s) if meta_s else {}
            if self.fake:
                n = int(meta.get("n_frames", 8))
                h = int(meta.get("height", 16))
                w = int(meta.get("width", 16))
                frames = [
                    _fold_bytes(payload[i:] + payload[:i], h, w) for i in range(n)
                ]
            else:
                frames = decode_ppm_stream(payload)
            for i in range(0, len(frames), self.stride):
                ids.append(mid)
                fidx.append(i)
                totals.append(len(frames))
                feats.append(_mean_pool(frames[i], self.thumb).ravel().tolist())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "n_frames": pa.array(totals, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
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


def sample_video_frames(
    ds: rd.Dataset, concurrency: int = 4, batch_size: int = 8,
    fake: bool = True, stride: int = 4,
) -> rd.Dataset:
    """Actor-pool video frame sampling — smaller batches still: video
    payloads are the largest of the three kinds."""
    return ds.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"fake": fake, "stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media_table(n: int = 64, real: bool = False) -> pa.Table:
    """Deterministic media rows for tests/queries (no external data).

    ``real=False``: opaque byte payloads for the fake pseudo-decode.
    ``real=True``: actual BMP/PPM/WAV/P6-stream payloads round n % 4
    (image-bmp, audio-wav, image-ppm, video) so ``fake=False`` stages
    run hermetically."""
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        if not real:
            kind = "image" if i % 2 == 0 else "audio"
            size = 64 + (i * 37) % 512
            payload = bytes(((i * 131 + j * 17) % 256) for j in range(size))
            meta = (
                {"width": 8 + i % 8, "height": 8 + (i * 3) % 8}
                if kind == "image"
                else {"sample_rate": 8000}
            )
        else:
            rng = np.random.default_rng(1000 + i)
            if i % 4 in (0, 2):
                kind = "image"
                h, w = 8 + (i * 3) % 9, 8 + i % 9
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                payload = encode_bmp(img) if i % 4 == 0 else encode_ppm(img)
                meta = {"width": w, "height": h}
            elif i % 4 == 1:
                kind = "audio"
                t = np.arange(1000 + (i * 97) % 1000, dtype=np.float64)
                payload = encode_wav(0.5 * np.sin(2 * np.pi * t * (i + 1) / 200.0))
                meta = {"sample_rate": 8000}
            else:
                kind = "video"
                h, w = 8 + i % 5, 8 + (i * 7) % 5
                frames = [
                    rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                    for _ in range(4 + i % 6)
                ]
                payload = encode_ppm_stream(frames)
                meta = {"width": w, "height": h, "n_frames": len(frames)}
        ids.append(i)
        kinds.append(kind)
        payloads.append(payload)
        metas.append(json.dumps(meta, sort_keys=True))
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()), "kind": pa.array(kinds),
         "payload": pa.array(payloads, pa.binary()), "meta": pa.array(metas)},
        schema=MEDIA_SCHEMA,
    )


# --------------------------------------------------- perceptual-hash dedup
def average_hash64(img: np.ndarray) -> int:
    """64-bit AVERAGE HASH (aHash): grayscale → 8×8 mean-pool → one bit
    per cell (above/below the 64-cell mean).  The classic cheap
    perceptual fingerprint: small jitter/noise/resize leaves most bits
    unchanged, so near-duplicate images sit within a small Hamming
    distance.  Deterministic integer pipeline (luma in integer e4)."""
    # integer ITU-R BT.601 luma (scaled by 1e4) — no float ordering
    lum = (
        img[:, :, 0].astype(np.int64) * 2989
        + img[:, :, 1].astype(np.int64) * 5870
        + img[:, :, 2].astype(np.int64) * 1141
    )
    h, w = lum.shape
    ys = (np.arange(9, dtype=np.int64) * h) // 8
    xs = (np.arange(9, dtype=np.int64) * w) // 8
    cells = np.empty((8, 8), dtype=np.int64)
    csum = lum.cumsum(0).cumsum(1)
    z = np.zeros((h + 1, w + 1), dtype=np.int64)
    z[1:, 1:] = csum
    for i in range(8):
        for j in range(8):
            a, b, c, d = ys[i], ys[i + 1], xs[j], xs[j + 1]
            area = max((b - a) * (d - c), 1)
            cells[i, j] = (z[b, d] - z[a, d] - z[b, c] + z[a, c]) // area
    bits = (cells.ravel() * 64 > cells.sum()).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class ImagePHashStage:
    """Actor-pool stage: decode (BMP/PPM) → 64-bit average hash per
    image.  Same shape as :class:`ImageDecodeStage` — codec dispatch
    bound once per actor, small batches, Arrow in/out."""

    OUT_SCHEMA = pa.schema([("media_id", pa.int64()), ("phash", pa.uint64())])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            img = decode_bmp(payload) if payload[:2] == b"BM" else decode_ppm(payload)
            ids.append(mid)
            hashes.append(average_hash64(img))
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "phash": pa.array(hashes, pa.uint64())},
            schema=self.OUT_SCHEMA,
        )


def synth_image_dup_table(n: int = 96) -> pa.Table:
    """Deterministic image corpus WITH planted near-duplicates: every
    3rd image is a jittered copy (±1 on a few random pixels — far under
    the aHash bit-flip threshold) of the previous base image; bases are
    independent random images (aHash collisions across independent
    64-px images are possible but rare)."""
    ids, kinds, payloads, metas = [], [], [], []
    base = None
    for i in range(n):
        rng = np.random.default_rng(5000 + i)
        if i % 3 == 2 and base is not None:
            img = base.astype(np.int64)
            idx = rng.integers(0, img.size, size=max(img.size // 50, 1))
            flat = img.ravel()
            flat[idx] = np.clip(flat[idx] + rng.integers(-1, 2, size=len(idx)), 0, 255)
            img = img.astype(np.uint8)
        else:
            h, w = 24 + (i * 5) % 17, 24 + (i * 11) % 17
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            base = img
        payloads.append(encode_bmp(img) if i % 2 == 0 else encode_ppm(img))
        ids.append(i)
        kinds.append("image")
        metas.append(json.dumps({"height": img.shape[0], "width": img.shape[1]},
                                sort_keys=True))
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()), "kind": pa.array(kinds),
         "payload": pa.array(payloads, pa.binary()), "meta": pa.array(metas)},
        schema=MEDIA_SCHEMA,
    )


def image_phash_dups(
    ds: rd.Dataset, max_hamming: int = 4, concurrency: int = 2, batch_size: int = 16
):
    """NEAR-DUPLICATE IMAGE detection: perceptual hash (aHash) per image
    via the actor-pool decode stage, then the SimHash banding recipe on
    the 64-bit hashes — 4×16-bit pigeonhole bands (Hamming ≤ 4 with ≤ 3
    differing bands ⇒ at least one band matches exactly... Hamming ≤ 3
    guarantees a clean band; at 4 a miss is possible only if every
    flipped bit lands in a distinct band AND all four bands differ —
    the standard recall/band tradeoff, widened here by also bucketing
    on band value so candidates stay tiny) → vectorized within-bucket
    pair emission → exact popcount verify ≤ max_hamming.

    Scale shape: payloads never leave the phash stage (8 B/image after
    it); ONE band-bucket exchange; per-bucket pairs via the shared
    ``_cell_pair_indices`` kernel; exact verify is vectorized xor +
    bit_count.  Returns (a, b, hamming) pairs, a < b, sorted."""
    hashes = ds.map_batches(
        ImagePHashStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return hash64_near_dup_pairs(hashes, max_hamming=max_hamming)


def hash64_near_dup_pairs(
    hashes: rd.Dataset,
    max_hamming: int = 4,
    id_col: str = "media_id",
    hash_col: str = "phash",
):
    """Shared 64-bit-fingerprint near-dup engine (images, audio, any
    perceptual hash): 4×16-bit pigeonhole banding → one band-bucket
    exchange → vectorized within-cell pairs → exact xor+popcount verify
    ≤ ``max_hamming``.  Hamming ≤ 3 recall is GUARANTEED; = 4 is the
    documented band tradeoff.  Input: a Dataset of (id, hash64)."""
    import pandas as pd

    from ..pipelines.dedup import _cell_pair_indices

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ph = batch[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_id = np.repeat(ids, 4)
        out_ph = np.repeat(ph, 4)
        band = np.tile(np.arange(4, dtype=np.int64), len(ids))
        key = ((out_ph >> (band.astype(np.uint64) * np.uint64(16)))
               & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {"id": pa.array(out_id, pa.int64()),
             "ph": pa.array(out_ph, pa.uint64()),
             "band": pa.array(band, pa.int64()),
             "key": pa.array(key, pa.int64())}
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": "int64", "b": "int64", "hamming": "int64"}
        if len(g) < 2:
            return pd.DataFrame({k: pd.Series(dtype=v) for k, v in cols.items()})
        g = g.sort_values(["band", "key", "id"])
        cell = (g["band"].to_numpy() << np.int64(16)) | g["key"].to_numpy()
        i, j = _cell_pair_indices(cell)
        if not len(i):
            return pd.DataFrame({k: pd.Series(dtype=v) for k, v in cols.items()})
        ids = g["id"].to_numpy(dtype=np.int64)
        ph = g["ph"].to_numpy().astype(np.uint64)
        x = ph[i] ^ ph[j]
        ham = np.zeros(len(x), dtype=np.int64)
        for s in range(8):  # vectorized popcount via byte table
            ham += np.unpackbits(
                ((x >> np.uint64(8 * s)) & np.uint64(0xFF)).astype(np.uint8)[:, None],
                axis=1,
            ).sum(1).astype(np.int64)
        keep = (ham <= max_hamming) & (ids[i] != ids[j])
        df = pd.DataFrame(
            {"a": np.minimum(ids[i][keep], ids[j][keep]),
             "b": np.maximum(ids[i][keep], ids[j][keep]),
             "hamming": ham[keep]}
        ).drop_duplicates(["a", "b"])
        return df.astype(cols)

    # band+key bucketing: a (band, key) cell holds all images sharing that
    # band value — pairs are emitted per cell, deduped across bands here
    parts = (
        hashes.map_batches(band_rows, batch_format="pyarrow")
        .groupby("key")
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    return (
        parts.drop_duplicates(["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


# ------------------------------------------------- audio fingerprint dedup
def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit AUDIO fingerprint (Haitsma & Kalker 2002 shape, collapsed
    to one word): split the clip into 65 equal frames, compute integer
    frame energies, emit one bit per CONSECUTIVE-FRAME energy increase —
    an energy-envelope signature robust to low-level noise and small
    gain changes (energy differences preserve order under mild
    perturbation).  Integer end-to-end: samples are quantized to e4
    ints before squaring, so no float ordering enters the bits."""
    n = len(samples)
    if n < 66:
        samples = np.pad(samples, (0, 66 - n))
        n = 66
    q = np.floor(samples * 1e4 + 0.5).astype(np.int64)
    bounds = (np.arange(66, dtype=np.int64) * n) // 65
    sq = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(q * q, out=sq[1:])
    sizes = np.maximum(np.diff(bounds), 1)
    energies = (sq[bounds[1:]] - sq[bounds[:-1]]) // sizes  # mean energy/frame
    bits = (np.diff(energies) > 0).astype(np.uint64)  # 64 bits
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


class AudioFingerprintStage:
    """Actor-pool stage: WAV decode → 64-bit energy-envelope fingerprint
    (payloads reduce to 8 B each; same shape as :class:`ImagePHashStage`)."""

    OUT_SCHEMA = pa.schema([("media_id", pa.int64()), ("afp", pa.uint64())])

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            samples, _sr = decode_wav(payload)
            ids.append(mid)
            fps.append(audio_fingerprint64(samples.astype(np.float64)))
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "afp": pa.array(fps, pa.uint64())},
            schema=self.OUT_SCHEMA,
        )


def synth_audio_dup_table(n: int = 60) -> pa.Table:
    """Deterministic WAV corpus with planted near-duplicates: every 3rd
    clip is the previous base clip with low-level noise (±2e-3 — far
    under the energy-envelope flip threshold); bases are distinct
    multi-tone clips."""
    ids, kinds, payloads, metas = [], [], [], []
    base = None
    for i in range(n):
        rng = np.random.default_rng(7000 + i)
        if i % 3 == 2 and base is not None:
            s = np.clip(base + rng.uniform(-2e-3, 2e-3, len(base)), -1, 1)
        else:
            t = np.arange(2000 + (i * 131) % 1500, dtype=np.float64)
            f1, f2 = 3 + i % 11, 17 + (i * 7) % 23
            s = 0.4 * np.sin(2 * np.pi * t * f1 / 500.0) + 0.3 * np.sin(
                2 * np.pi * t * f2 / 500.0 + i
            )
            # per-clip amplitude envelope so energy profiles differ
            s *= 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * t * (1 + i % 5) / len(t)))
            base = s
        payloads.append(encode_wav(s))
        ids.append(i)
        kinds.append("audio")
        metas.append(json.dumps({"sample_rate": 8000}, sort_keys=True))
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()), "kind": pa.array(kinds),
         "payload": pa.array(payloads, pa.binary()), "meta": pa.array(metas)},
        schema=MEDIA_SCHEMA,
    )


def audio_fp_dups(
    ds: rd.Dataset, max_hamming: int = 4, concurrency: int = 2, batch_size: int = 16
):
    """NEAR-DUPLICATE AUDIO detection: energy-envelope fingerprints via
    the actor-pool WAV stage, then the SHARED 64-bit banding engine
    (:func:`hash64_near_dup_pairs`) — one exchange, exact popcount
    verify.  Returns (a, b, hamming), a < b, sorted."""
    fps = ds.map_batches(
        AudioFingerprintStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return hash64_near_dup_pairs(fps, max_hamming=max_hamming, hash_col="afp")


# --------------------------------------------------- shot-boundary detection
class VideoSceneStage:
    """SHOT-BOUNDARY (scene-cut) detection — the classic pairwise
    frame-difference detector (threshold on mean absolute luma change,
    the baseline every shot-detection survey starts from).  One output
    row per video: frame count, detected scene count, and the boundary
    frame indices (frame i starts a new scene when
    mean|luma_i - luma_{i-1}| > threshold on mean-pooled thumbnails).

    Real mode decodes the concatenated-P6 stream with the hermetic
    codec; payloads never leave the stage — only the tiny boundary rows
    flow on.  Deterministic: the score is the full-frame mean absolute
    RGB difference (no pooling — pooling averages away most of the
    inter-scene signal), floored to an e3 integer before the
    comparison.  Uniform-random scene changes score ≈ 85, small-jitter
    within-scene diffs ≈ 3, so the default threshold 30 sits mid-gap."""

    def __init__(self, fake: bool = True, threshold: float = 30.0) -> None:
        self.fake = fake
        self.thr_e3 = int(round(threshold * 1e3))

    def _frames(self, payload: bytes, meta: dict) -> list[np.ndarray]:
        if self.fake:
            n = int(meta.get("n_frames", 8))
            h = int(meta.get("height", 16))
            w = int(meta.get("width", 16))
            frames = [_fold_bytes(payload[i:] + payload[:i], h, w)
                      for i in range(n)]
        else:
            frames = decode_ppm_stream(payload)
        return [f.astype(np.float64) for f in frames]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nf, ns, bounds = [], [], [], []
        for mid, payload, meta_s in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta"].to_pylist(),
        ):
            meta = json.loads(meta_s) if meta_s else {}
            frames = self._frames(payload, meta)
            cuts = []
            for i in range(1, len(frames)):
                d_e3 = int(np.floor(
                    float(np.abs(frames[i] - frames[i - 1]).mean()) * 1e3 + 0.5
                ))
                if d_e3 > self.thr_e3:
                    cuts.append(i)
            ids.append(mid)
            nf.append(len(frames))
            ns.append(len(cuts) + 1)
            bounds.append(cuts)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(nf, pa.int32()),
                "n_scenes": pa.array(ns, pa.int32()),
                "boundaries": pa.array(bounds, pa.list_(pa.int32())),
            }
        )


def detect_video_scenes(
    ds: rd.Dataset, concurrency: int = 4, batch_size: int = 8,
    fake: bool = True, threshold: float = 30.0,
) -> rd.Dataset:
    """Actor-pool shot-boundary detection over a media table (small
    batches — video payloads dominate block size)."""
    return ds.map_batches(
        VideoSceneStage,
        fn_constructor_kwargs={"fake": fake, "threshold": threshold},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_video_scene_table(n: int = 24) -> pa.Table:
    """Deterministic planted-scene video corpus: each video holds
    1 + i%4 scenes; frames WITHIN a scene are a random base image plus
    small (±4) jitter, scene changes draw a fresh base — so true cuts
    have mean luma diff ≈ 85 and within-scene diffs ≈ 4.  The true
    boundary list rides the meta JSON for the recovery test."""
    ids, kinds, payloads, metas = [], [], [], []
    for i in range(n):
        rng = np.random.default_rng(5000 + i)
        h, w = 12, 12
        n_scenes = 1 + i % 4
        frames, true_bounds = [], []
        for s in range(n_scenes):
            base = rng.integers(0, 256, (h, w, 3), dtype=np.int64)
            if s > 0:
                true_bounds.append(len(frames))
            for _ in range(3 + (i + s) % 3):
                jit = rng.integers(-4, 5, (h, w, 3))
                frames.append(np.clip(base + jit, 0, 255).astype(np.uint8))
        ids.append(i)
        kinds.append("video")
        payloads.append(encode_ppm_stream(frames))
        metas.append(json.dumps(
            {"width": w, "height": h, "n_frames": len(frames),
             "true_bounds": true_bounds}, sort_keys=True))
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()), "kind": pa.array(kinds),
         "payload": pa.array(payloads, pa.binary()), "meta": pa.array(metas)},
        schema=MEDIA_SCHEMA,
    )


# --------------------------------------------------- media quality signals
class MediaQualityStage:
    """Per-asset QUALITY SIGNALS over the real codecs — the multimodal
    twin of the text quality scorer: images report brightness (mean
    luma), contrast (luma std) and a 16-bin luma entropy; audio reports
    RMS level, zero-crossing rate and duration.  The gate every media
    training corpus runs before decode-heavy featurization (drop
    black/blank frames, silence, clipped captures).

    Integer e6 outputs from one vectorized pass per payload; payloads
    never leave the stage."""

    def __init__(self, fake: bool = False) -> None:
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds_o, m1, m2, m3 = [], [], [], [], []
        for mid, kind, payload, meta_s in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["meta"].to_pylist(),
        ):
            meta = json.loads(meta_s) if meta_s else {}
            if kind == "image":
                if self.fake:
                    img = _fold_bytes(payload, int(meta.get("height", 16)),
                                      int(meta.get("width", 16)))
                else:
                    img = (decode_bmp(payload) if payload[:2] == b"BM"
                           else decode_ppm(payload))
                luma = img.astype(np.float64).mean(axis=2)
                bright = float(luma.mean())
                contrast = float(luma.std())
                hist = np.bincount(
                    np.minimum((luma / 16).astype(np.int64), 15).ravel(),
                    minlength=16,
                ).astype(np.float64)
                p = hist / hist.sum()
                ent = float(-(p[p > 0] * np.log2(p[p > 0])).sum())
                vals = (bright, contrast, ent)
            elif kind == "audio":
                samples, rate = decode_wav(payload)
                x = samples.astype(np.float64)
                rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
                zc = (
                    float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
                    if len(x) > 1 else 0.0
                )
                dur = float(len(x)) / float(rate) if rate else 0.0
                vals = (rms, zc, dur)
            else:
                continue  # video quality rides the scene detector
            ids.append(mid)
            kinds_o.append(kind)
            m1.append(int(np.floor(vals[0] * 1e6 + 0.5)))
            m2.append(int(np.floor(vals[1] * 1e6 + 0.5)))
            m3.append(int(np.floor(vals[2] * 1e6 + 0.5)))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds_o, pa.string()),
            # image: brightness/contrast/entropy; audio: rms/zcr/duration
            "q1_e6": pa.array(m1, pa.int64()),
            "q2_e6": pa.array(m2, pa.int64()),
            "q3_e6": pa.array(m3, pa.int64()),
        })


def media_quality(
    ds: rd.Dataset, concurrency: int = 4, batch_size: int = 16,
    fake: bool = False,
) -> rd.Dataset:
    """Actor-pool media quality signals (images + audio; small batches,
    Arrow in/out)."""
    return ds.map_batches(
        MediaQualityStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
