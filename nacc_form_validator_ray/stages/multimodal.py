"""Multimodal (image/audio/video) stage plumbing.

Media rides as opaque ``binary`` columns with typed metadata. The decode
kernels themselves need libs this container does not ship (PIL, ffmpeg,
torchaudio) — they are gated behind import-try and raise
``NotImplementedError`` when absent, with a deterministic fake decoder so
the RAY-SIDE plumbing (schema, batch sizing, actor-pool signature, output
layout) is real and tested.

Scale notes baked into the design:
* decode stages are ACTOR POOLS (``concurrency=(lo, hi)``) because codec
  contexts / model weights load once per actor;
* batches must be SMALL (``batch_size≈32``) — a 4K frame ×
  batch × concurrency must fit the worker heap;
* outputs are fixed-shape float arrays (Ray tensor extension handles
  them natively) plus pass-through metadata columns.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np
import pandas as pd

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore
    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


#: counter-based pixel generator constants (public LCG family over the
#: Mersenne prime 2^31-1 — the same mod-P31 arithmetic the minhash and
#: quantized-LSH twins use, so DuckDB reproduces every pixel exactly)
_PIX_A, _PIX_B = 1103515245, 12345
_P31 = 2 ** 31 - 1


def fake_decode_image(payload: bytes, size: Tuple[int, int]) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes -> pseudo-pixels.

    seed = first 60 bits of sha256(payload) mod P31; pixel i (row-major,
    channel-last) is ((A*((seed+i+1) mod P31) + B) mod P31) mod 256 — a
    CLOSED-FORM counter hash rather than a sequential RNG, so the DuckDB
    twin (pipelines/queries.sql_multimodal_decode) regenerates the exact
    pixel array in SQL. Stable across runs/workers; swap for a real
    decoder by constructing the stage with ``use_fake=False`` in an
    environment that has PIL."""
    h = hashlib.sha256(payload).hexdigest()
    seed = int(h[:15], 16) % _P31
    i = np.arange(size[0] * size[1] * 3, dtype=np.int64)
    vals = (_PIX_A * ((seed + i + 1) % _P31) + _PIX_B) % _P31 % 256
    return vals.astype(np.uint8).reshape(size[1], size[0], 3)


class DecodeImage:
    """binary column -> fixed-size RGB array column (actor-pool stage)."""

    def __init__(self, payload_column: str = "payload",
                 output_column: str = "image",
                 size: Tuple[int, int] = (32, 32),
                 use_fake: Optional[bool] = None):
        self.payload_column = payload_column
        self.output_column = output_column
        self.size = size
        self.use_fake = (not _HAS_PIL) if use_fake is None else use_fake
        if not self.use_fake and not _HAS_PIL:
            raise NotImplementedError(
                "real image decode requires PIL, which is not available "
                "in this container; construct with use_fake=True")

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.use_fake:
            return fake_decode_image(payload, self.size)
        img = Image.open(__import__("io").BytesIO(payload))  # pragma: no cover
        return np.asarray(img.convert("RGB").resize(self.size))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[self.output_column] = [
            self._decode(p if isinstance(p, (bytes, bytearray)) else b"")
            for p in batch[self.payload_column]]
        return batch


class ImageFeatures:
    """Decoded image -> small feature vector (mean/std per channel +
    8-bin luminance histogram). Deterministic, vectorizable, and the
    same shape a real embedding model stage would produce."""

    def __init__(self, image_column: str = "image",
                 output_column: str = "image_features"):
        self.image_column = image_column
        self.output_column = output_column

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for img in batch[self.image_column]:
            arr = np.asarray(img, dtype=np.float64)
            mean = arr.mean(axis=(0, 1))
            std = arr.std(axis=(0, 1))
            lum = arr.mean(axis=2)
            # explicit floor-division histogram (== np.histogram with
            # bins=8, range=(0,256) for values in [0,256)): the binning
            # rule floor(lum/32) is what the DuckDB twin states, and
            # every intermediate here is exact float arithmetic over
            # integer pixels, so SQL reproduces it bit-for-bit
            bins = np.floor(lum / 32).astype(np.intp).ravel()
            hist = np.bincount(bins, minlength=8)[:8]
            hist = hist / max(lum.size, 1)
            feats.append(np.concatenate([mean, std, hist]))
        batch = batch.copy()
        batch[self.output_column] = feats
        return batch


class FrameSampler:
    """Video binary -> every-nth "frame" payload rows (flat_map shape).

    With no real container parser, frames are fixed-size byte slices;
    the output layout (one row per sampled frame, parent id + frame
    index) matches what an ffmpeg-backed sampler would emit."""

    def __init__(self, payload_column: str = "payload",
                 id_column: str = "media_id",
                 frame_bytes: int = 256, every_nth: int = 4):
        self.payload_column = payload_column
        self.id_column = id_column
        self.frame_bytes = frame_bytes
        self.every_nth = every_nth

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, frame_idx, payloads = [], [], []
        for mid, payload in zip(batch[self.id_column],
                                batch[self.payload_column]):
            if not isinstance(payload, (bytes, bytearray)):
                continue
            n_frames = max(len(payload) // self.frame_bytes, 1)
            for f in range(0, n_frames, self.every_nth):
                ids.append(mid)
                frame_idx.append(f)
                payloads.append(bytes(
                    payload[f * self.frame_bytes:
                            (f + 1) * self.frame_bytes]))
        return pd.DataFrame({self.id_column: ids,
                             "frame_index": frame_idx,
                             "frame_payload": payloads})


def decode_images(ds, batch_size: int = 32, concurrency=(1, 8), **kwargs):
    """Dataset wrapper: small batches + actor pool for the decode stage."""
    return ds.map_batches(DecodeImage, fn_constructor_kwargs=kwargs,
                          batch_format="pandas", batch_size=batch_size,
                          concurrency=concurrency)


class AudioFeatures:
    """Audio binary -> fixed-size feature vector (deterministic stand-in
    for an MFCC/mel extractor; torchaudio/librosa are absent here).

    Interprets the payload as 16-bit PCM frames and emits windowed RMS
    energies + zero-crossing rate — numpy-vectorized per clip, the same
    actor-pool batch shape a real extractor would use (small batches:
    audio payloads are large)."""

    def __init__(self, payload_column: str = "payload",
                 output_column: str = "audio_features",
                 n_windows: int = 8):
        self.payload_column = payload_column
        self.output_column = output_column
        self.n_windows = n_windows

    def _features(self, payload: bytes) -> np.ndarray:
        if len(payload) < 4:
            return np.zeros(self.n_windows + 1)
        pcm = np.frombuffer(payload[:len(payload) // 2 * 2],
                            dtype="<i2").astype(np.float64) / 32768.0
        win = max(len(pcm) // self.n_windows, 1)
        rms = np.array([
            np.sqrt(np.mean(pcm[i * win:(i + 1) * win] ** 2))
            if len(pcm[i * win:(i + 1) * win]) else 0.0
            for i in range(self.n_windows)])
        zcr = float(np.mean(np.abs(np.diff(np.signbit(pcm))))) \
            if len(pcm) > 1 else 0.0
        return np.concatenate([rms, [zcr]])

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[self.output_column] = [
            self._features(p if isinstance(p, (bytes, bytearray))
                           else b"")
            for p in batch[self.payload_column]]
        return batch
