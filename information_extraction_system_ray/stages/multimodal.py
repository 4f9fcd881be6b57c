"""Multimodal (image/audio/video) column stages (system-prompt scope).

Media travel as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample are actor-pool ``map_batches``
stages. Two decode modes:

- ``decoder="real"`` (rounds 3–4): REAL pure-stdlib codecs from
  ``sources/mediacodec.py`` — PPM/PGM/BMP/PNG/baseline-JPEG images,
  PCM WAV audio with a real numpy-FFT log-mel filterbank, and
  concatenated-P6 "video" streams. MP3/MP4 still require codec
  libraries absent from this container and are rejected with a clear
  ValueError per payload.
- ``decoder="fake"`` (default): deterministic pseudo-decode from the
  byte content, keeping the Ray-side plumbing — schema, batch size,
  actor signature, output layout — testable for any payload.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()), ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: bytes → pseudo-pixels (uint8 h×w×3)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class DecodeImage:
    """Actor stage: payload bytes → fixed-size feature vector.

    __init__ binds the codec once per actor; __call__ decodes (REAL
    PPM/PGM/BMP under decoder="real"), resizes to (size, size) and emits
    a 64-d mean-pooled feature column — the layout a real embedding
    model stage would produce."""

    def __init__(self, size: int = 32, decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self._real = decoder == "real"
        if self._real:
            from ..sources.mediacodec import decode_image, resize_mean
            self._decode = decode_image
            self._resize = resize_mean
        self.size = size

    def _feature(self, px: np.ndarray) -> "list[float]":
        # 64-d feature: mean over an 8x8 grid of the gray channel
        gray = px.mean(axis=2)
        cell = self.size // 8
        f = gray[:8 * cell, :8 * cell] \
            .reshape(8, cell, 8, cell).mean(axis=(1, 3)).ravel()
        return (f / 255.0).astype(np.float32).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            if self._real:
                px = self._resize(self._decode(payload), self.size)
            else:
                px = _fake_pixels(payload, self.size, self.size)
            feats.append(self._feature(px))
        return pa.table({
            "media_id": batch["media_id"],
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


class DecodeAudio:
    """Actor stage: audio payload → log-mel feature matrix flattened to
    one row (n_mels × n_frames). Under decoder="real" this is a REAL
    feature extractor: stdlib WAV decode + Hann-windowed |rfft|² + HTK
    mel filterbank + log10 (mediacodec.log_mel); "fake" keeps the
    deterministic stand-in for non-WAV payloads."""

    def __init__(self, n_mels: int = 16, hop_ms: int = 250,
                 max_frames: int = 32, decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self._real = decoder == "real"
        if self._real:
            from ..sources.mediacodec import decode_wav, log_mel
            self._decode = decode_wav
            self._log_mel = log_mel
        self.n_mels = n_mels
        self.hop_ms = hop_ms
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, nfr = [], [], []
        for mid, payload, dur in zip(batch["media_id"].to_pylist(),
                                     batch["payload"].to_pylist(),
                                     batch["duration_ms"].to_pylist()):
            if self._real:
                samples, rate = self._decode(payload)
                mel = self._log_mel(samples, rate, n_mels=self.n_mels,
                                    hop_ms=self.hop_ms,
                                    max_frames=self.max_frames)
                frames = mel.shape[1]
            else:
                frames = min(self.max_frames,
                             max(1, int(dur or 0) // self.hop_ms))
                seed = int.from_bytes(
                    hashlib.sha256(payload).digest()[8:16], "big")
                rng = np.random.default_rng(seed)
                mel = rng.random((self.n_mels, frames), dtype=np.float32)
            ids.append(mid)
            nfr.append(frames)
            feats.append(mel.ravel().tolist())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_frames": pa.array(nfr, pa.int32()),
            "mel": pa.array(feats, pa.list_(pa.float32())),
        })


class SampleFrames:
    """Actor stage: video payload → one output row per sampled frame
    (explode layout used by real frame pipelines). Under decoder="real"
    the payload is a concatenated-P6 stream: frames are actually
    demuxed and the sampled frame's pixel digest is emitted."""

    def __init__(self, every_ms: int = 1000, decoder: str = "fake") -> None:
        if decoder not in ("fake", "real"):
            raise ValueError(f"unknown decoder {decoder!r}")
        self._real = decoder == "real"
        if self._real:
            from ..sources.mediacodec import iter_ppm_stream
            self._demux = iter_ppm_stream
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ts, frames = [], [], []
        for mid, payload, dur in zip(batch["media_id"].to_pylist(),
                                     batch["payload"].to_pylist(),
                                     batch["duration_ms"].to_pylist()):
            d = max(int(dur or 0), 1)
            if self._real:
                # demux the concatenated-P6 stream; sample the frame
                # whose (even-spread) timestamp covers each tick
                decoded = [f for _, f in self._demux(payload)]
                if not decoded:
                    continue
                n = len(decoded)
                for t in range(0, d, self.every_ms):
                    idx = min(n - 1, (t * n) // d)
                    ids.append(mid)
                    ts.append(t)
                    frames.append(hashlib.sha256(
                        decoded[idx].tobytes()).digest()[:16])
            else:
                for t in range(0, d, self.every_ms):
                    ids.append(mid)
                    ts.append(t)
                    frames.append(hashlib.sha256(
                        payload + t.to_bytes(4, "big")).digest()[:16])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_ms": pa.array(ts, pa.int32()),
            "frame_key": pa.array(frames, pa.binary()),
        })


def decode_images(media: ray.data.Dataset, *, size: int = 32,
                  decoder: str = "fake", concurrency=(1, 4),
                  batch_size: int = 64) -> ray.data.Dataset:
    """Small batches: binary payloads are fat rows (SURVEY.md §4)."""
    return media.map_batches(
        DecodeImage, fn_constructor_kwargs={"size": size,
                                            "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def decode_audio(media: ray.data.Dataset, *, n_mels: int = 16,
                 hop_ms: int = 250, decoder: str = "fake",
                 concurrency=(1, 4),
                 batch_size: int = 64) -> ray.data.Dataset:
    return media.map_batches(
        DecodeAudio, fn_constructor_kwargs={"n_mels": n_mels,
                                            "hop_ms": hop_ms,
                                            "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def sample_frames(media: ray.data.Dataset, *, every_ms: int = 1000,
                  decoder: str = "fake", concurrency=(1, 4),
                  batch_size: int = 32) -> ray.data.Dataset:
    return media.map_batches(
        SampleFrames, fn_constructor_kwargs={"every_ms": every_ms,
                                             "decoder": decoder},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class SceneCuts:
    """Actor stage: video payload → per-video shot-boundary summary.
    Demuxes the concatenated-P6 stream (sources/mediacodec.py) and marks
    a cut at frame i when the mean absolute pixel delta |f_i − f_{i−1}|
    exceeds ``threshold_milli`` (milli-levels, 0–255000). The delta is
    computed in exact integer arithmetic (int64 sum × 1000 // n_px), so
    detection is bit-deterministic. One output row per video: frame
    count, cut count, and the comma-joined cut indices (bounded cell —
    real shot lists are short; cap guards a pathological strobe)."""

    MAX_CUTS_LISTED = 64

    def __init__(self, threshold_milli: int = 20_000) -> None:
        from ..sources.mediacodec import iter_ppm_stream

        self._demux = iter_ppm_stream
        self.threshold_milli = threshold_milli

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nfr, ncut, idxs = [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            frames = [f for _, f in self._demux(payload)]
            cuts = []
            for i in range(1, len(frames)):
                a = frames[i].astype(np.int64)
                b = frames[i - 1].astype(np.int64)
                if a.shape != b.shape:   # resolution change IS a cut
                    cuts.append(i)
                    continue
                delta = int(np.abs(a - b).sum()) * 1000 // a.size
                if delta > self.threshold_milli:
                    cuts.append(i)
            ids.append(mid)
            nfr.append(len(frames))
            ncut.append(len(cuts))
            idxs.append(",".join(map(str, cuts[:self.MAX_CUTS_LISTED])))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_frames": pa.array(nfr, pa.int32()),
            "n_cuts": pa.array(ncut, pa.int32()),
            "cut_idxs": pa.array(idxs, pa.string()),
        })


def scene_cuts(media: ray.data.Dataset, *, threshold_milli: int = 20_000,
               concurrency=(1, 4), batch_size: int = 16
               ) -> ray.data.Dataset:
    """Small batches: video payloads are the fattest rows (SURVEY.md §4)."""
    return media.map_batches(
        SceneCuts, fn_constructor_kwargs={"threshold_milli":
                                          threshold_milli},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class VadSegments:
    """Actor stage: WAV payload → energy-based voice-activity segments
    (the speech/noise gate an audio-corpus pipeline runs before any
    transcription or feature stage). Frames of ``frame_ms`` every
    ``hop_ms``; a frame is voiced when its integer energy (sum of
    squared int16-scaled samples) exceeds ``threshold_ppm`` parts-per-
    million of the clip's PEAK frame energy — the peak-relative gate is
    robust to mostly-voiced clips where a median gate saturates. Runs
    of voiced frames merge into segments. All decisions are exact-
    integer, so the output is bit-deterministic. One row per segment:
    (media_id, seg_idx, start_ms, end_ms); silent clips emit no rows,
    summarized instead by the caller."""

    def __init__(self, frame_ms: int = 25, hop_ms: int = 10,
                 threshold_ppm: int = 10_000) -> None:
        from ..sources.mediacodec import decode_wav

        self._decode = decode_wav
        self.frame_ms = frame_ms
        self.hop_ms = hop_ms
        self.threshold_ppm = threshold_ppm

    def _frame_energy(self, x: np.ndarray, rate: int) -> np.ndarray:
        # int64 energies on the int16 grid — exact, no float threshold
        xi = np.round(x * 32767.0).astype(np.int64)
        flen = max(1, rate * self.frame_ms // 1000)
        hop = max(1, rate * self.hop_ms // 1000)
        if len(xi) < flen:
            xi = np.pad(xi, (0, flen - len(xi)))
        n_frames = 1 + (len(xi) - flen) // hop
        idx = (np.arange(n_frames)[:, None] * hop
               + np.arange(flen)[None, :])
        sq = xi * xi
        return sq[idx].sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, seg, st, en = [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            x, rate = self._decode(payload)
            e = self._frame_energy(x, rate)
            peak = int(e.max())
            if peak == 0:
                continue
            voiced = e * 1_000_000 > self.threshold_ppm * peak
            # run-length merge of consecutive voiced frames
            d = np.diff(voiced.astype(np.int8))
            starts = np.flatnonzero(d == 1) + 1
            ends = np.flatnonzero(d == -1) + 1
            if voiced[0]:
                starts = np.concatenate([[0], starts])
            if voiced[-1]:
                ends = np.concatenate([ends, [len(voiced)]])
            for k, (a, b) in enumerate(zip(starts, ends)):
                ids.append(mid)
                seg.append(k)
                st.append(int(a) * self.hop_ms)
                en.append((int(b) - 1) * self.hop_ms + self.frame_ms)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "seg_idx": pa.array(seg, pa.int32()),
            "start_ms": pa.array(st, pa.int64()),
            "end_ms": pa.array(en, pa.int64()),
        })


def vad_segments(media: ray.data.Dataset, *, frame_ms: int = 25,
                 hop_ms: int = 10, threshold_ppm: int = 10_000,
                 concurrency=(1, 4), batch_size: int = 32
                 ) -> ray.data.Dataset:
    """Audio payloads are fat rows — keep batches small (SURVEY.md §4)."""
    return media.map_batches(
        VadSegments,
        fn_constructor_kwargs={"frame_ms": frame_ms, "hop_ms": hop_ms,
                               "threshold_ppm": threshold_ppm},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def synth_media(n: int, seed: int = 5) -> ray.data.Dataset:
    """Deterministic fake media table in MEDIA_SCHEMA (tests/bench only)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()
                    for _ in range(n)],
        "mime": ["application/octet-stream"] * n,
        "width": [32] * n, "height": [32] * n,
        "duration_ms": [int(rng.integers(1000, 8000)) for _ in range(n)],
    }
    t = pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "kind": pa.array(rows["kind"], pa.string()),
        "payload": pa.array(rows["payload"], pa.binary()),
        "mime": pa.array(rows["mime"], pa.string()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
    })
    return ray.data.from_arrow(t)


_PHASH_DCT = None


def phash64(px: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an (h, w, 3) or (h, w) uint8 image:
    grayscale by exact-integer channel mean, block-mean resize to 32×32,
    orthonormal DCT-II (numpy matmul basis — deterministic float64), and
    1 bit per coefficient of the top-left 8×8 low-frequency block (DC
    excluded) against their median. Near-identical images differ in a
    few bits; unrelated ones in ~32 — the standard pHash contract."""
    global _PHASH_DCT
    if px.ndim == 3:
        g = px.astype(np.int64).sum(axis=2) // px.shape[2]
    else:
        g = px.astype(np.int64)
    h, w = g.shape
    # block-mean resize to 32x32 (pad by edge-clamp via index mapping)
    yi = (np.arange(32)[:, None] * h) // 32
    y2 = np.maximum(((np.arange(32)[:, None] + 1) * h) // 32, yi + 1)
    xi = (np.arange(32)[None, :] * w) // 32
    x2 = np.maximum(((np.arange(32)[None, :] + 1) * w) // 32, xi + 1)
    cs = np.zeros((h + 1, w + 1), np.int64)
    cs[1:, 1:] = g.cumsum(axis=0).cumsum(axis=1)
    area = (y2 - yi) * (x2 - xi)
    small = (cs[y2, x2] - cs[yi, x2] - cs[y2, xi] + cs[yi, xi]) / area
    if _PHASH_DCT is None:
        n = 32
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        basis = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) \
            * np.sqrt(2.0 / n)
        basis[0] /= np.sqrt(2.0)
        _PHASH_DCT = basis
    d = _PHASH_DCT @ small @ _PHASH_DCT.T
    lo = d[:8, :8].copy().ravel()
    lo[0] = np.median(lo[1:])   # drop DC from the comparison set
    med = np.median(lo[1:])
    bits = (lo > med).astype(np.uint64)
    out = np.uint64(0)
    for b in bits:
        out = (out << np.uint64(1)) | b
    return int(out)


class PHashImages:
    """Actor stage: binary image payload → (media_id, phash int64) via
    the real pure-stdlib decoders (sources/mediacodec.py)."""

    def __init__(self) -> None:
        from ..sources.mediacodec import decode_image

        self._decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hs = [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            px = self._decode(payload)
            ids.append(mid)
            hs.append(np.uint64(phash64(px)).astype(np.int64))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "phash": pa.array(np.array(hs, np.int64))})


def phash_images(media: ray.data.Dataset, *, concurrency=(1, 4),
                 batch_size: int = 64) -> ray.data.Dataset:
    return media.map_batches(PHashImages, batch_format="pyarrow",
                             batch_size=batch_size,
                             concurrency=concurrency)
