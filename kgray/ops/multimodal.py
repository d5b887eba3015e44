"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container, so
the decode kernels are STUBS behind a clearly-marked gate — but the
Ray-side plumbing is real and tested: binary columns flow as Arrow
``large_binary`` (keep batches small: payload bytes x batch_size x
concurrency must fit the worker heap), feature extraction is an actor-pool
``map_batches`` stage whose model state loads once per actor, and outputs
are fixed-size float vectors + scalar metadata.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

try:  # the real decoders would land here (PIL / torchaudio / pyav)
    import PIL.Image  # type: ignore # noqa: F401

    _HAVE_IMAGE_LIBS = True
except ImportError:
    _HAVE_IMAGE_LIBS = False


def attach_payload(batch: pa.Table, source_col: str = "text") -> pa.Table:
    """Demo payload builder: treat a text column's UTF-8 bytes as an opaque
    binary payload (stands in for image/audio bytes read via
    ``read_binary_files``).  Zero-copy Arrow cast, no Python loop."""
    col = batch[source_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    payload = pc.cast(pc.cast(col, pa.large_string()), pa.large_binary())
    return batch.append_column("payload", payload)


class FeatureExtractor:
    """Actor-pool multimodal feature stage.

    ``__init__`` loads the model once per actor (here: a deterministic fake
    when the decode libs are absent); ``__call__`` maps payload bytes to a
    fixed-size feature vector + metadata.  The signature, batch schema and
    output layout are exactly what a real CLIP/wav2vec stage would use.
    """

    def __init__(self, dim: int = 16, use_real_decoder: bool = False):
        if use_real_decoder and not _HAVE_IMAGE_LIBS:
            raise NotImplementedError(
                "No image/audio decode libraries in this environment; "
                "run with use_real_decoder=False for the deterministic fake."
            )
        self.dim = dim
        self.use_real_decoder = use_real_decoder

    def _features(self, payload: bytes) -> np.ndarray:
        if self.use_real_decoder:
            raise NotImplementedError("real decoder path requires PIL/torchaudio")
        # deterministic fake: md5-seeded unit vector (stable across runs)
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        v = rng.standard_normal(self.dim)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._features(p) for p in payloads])
        sizes = pa.array([len(p) for p in payloads], type=pa.int64())
        out = batch.drop_columns(["payload"])  # payloads are consumed, not re-shipped
        out = out.append_column("payload_bytes", sizes)
        return out.append_column(
            "features", pa.FixedSizeListArray.from_arrays(pa.array(feats.ravel(), type=pa.float32()), self.dim)
        )


def extract_features(
    ds: ray.data.Dataset,
    source_col: str = "text",
    dim: int = 16,
    batch_size: int = 64,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """documents-with-payload → features.  Small batch_size on purpose:
    with real image/audio payloads, batch bytes dominate worker memory.
    ``concurrency`` defaults to an autoscaling pool sized from the cluster
    (tiny inputs spawn one actor, big inputs use the node)."""
    if concurrency is None:
        from kgray.functions.broadcast import auto_concurrency

        concurrency = auto_concurrency()
    with_payload = ds.map_batches(
        lambda t: attach_payload(t, source_col), batch_format="pyarrow"
    )
    return with_payload.map_batches(
        FeatureExtractor,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Actor-pool video-frame sampling stage: one payload row expands to
    ``ceil(len / frame_size)`` frame rows.

    Real video decode (pyav keyframe extraction) is not available in this
    container, so the "decoder" is a deterministic fake — fixed-size byte
    slices stand in for frames — but the Ray plumbing is the real thing: a
    1→N row expansion inside ``map_batches`` on an actor pool, small
    ``batch_size`` because payload bytes dominate worker memory, frame
    payloads emitted as ``large_binary`` plus scalar metadata (index,
    length, content digest) so a downstream embedding stage can stream
    them without re-decoding.
    """

    def __init__(self, frame_size: int = 256, max_frames: int | None = None,
                 use_real_decoder: bool = False):
        if use_real_decoder:
            raise NotImplementedError(
                "No video decode libraries in this environment; "
                "run with use_real_decoder=False for the byte-slice fake."
            )
        self.frame_size = frame_size
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        fs = self.frame_size
        ids, idxs, frames, lens, digests = [], [], [], [], []
        id_col = batch.column_names[0]
        for rid, payload in zip(
            batch[id_col].to_pylist(), batch["payload"].to_pylist()
        ):
            n = -(-len(payload) // fs)  # ceil
            if self.max_frames is not None:
                n = min(n, self.max_frames)
            for i in range(n):
                chunk = payload[i * fs : (i + 1) * fs]
                ids.append(rid)
                idxs.append(i)
                frames.append(chunk)
                lens.append(len(chunk))
                digests.append(hashlib.md5(chunk).hexdigest())
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int64()),
                "frame": pa.array(frames, type=pa.large_binary()),
                "frame_len": pa.array(lens, type=pa.int64()),
                "frame_md5": pa.array(digests, type=pa.large_string()),
            }
        )


def sample_frames(
    ds: ray.data.Dataset,
    source_col: str = "text",
    frame_size: int = 256,
    max_frames: int | None = None,
    batch_size: int = 64,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """payload rows → frame rows (1→N expansion).  Output block sizes grow
    by the expansion factor, so ``batch_size`` must shrink as frame counts
    grow; ``max_frames`` bounds worst-case expansion for long videos."""
    if concurrency is None:
        from kgray.functions.broadcast import auto_concurrency

        concurrency = auto_concurrency()
    with_payload = ds.map_batches(
        lambda t: attach_payload(t, source_col), batch_format="pyarrow"
    )
    return with_payload.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"frame_size": frame_size, "max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizer:
    """Actor-pool image-resize stage.  Real decode/resize (PIL) is gated —
    absent in this container — so the "resize" is a deterministic fake
    (truncate the payload to width×height bytes, standing in for the
    resampled pixel buffer); the Ray plumbing is real: actor pool, small
    payload-dominated batches, binary out-column + (width, height, bytes,
    digest) metadata for the downstream embedding stage."""

    def __init__(self, width: int = 32, height: int = 32, use_real_decoder: bool = False):
        if use_real_decoder and not _HAVE_IMAGE_LIBS:
            raise NotImplementedError(
                "No image decode libraries in this environment; "
                "run with use_real_decoder=False for the deterministic fake."
            )
        self.width = width
        self.height = height
        self.use_real_decoder = use_real_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.use_real_decoder:
            raise NotImplementedError("real resize path requires PIL")
        cap = self.width * self.height
        payloads = [p[:cap] for p in batch["payload"].to_pylist()]
        out = batch.drop_columns(["payload"])
        out = out.append_column("resized", pa.array(payloads, type=pa.large_binary()))
        out = out.append_column(
            "width", pa.array([self.width] * len(payloads), type=pa.int64())
        )
        out = out.append_column(
            "height", pa.array([self.height] * len(payloads), type=pa.int64())
        )
        out = out.append_column(
            "n_bytes", pa.array([len(p) for p in payloads], type=pa.int64())
        )
        return out.append_column(
            "content_md5",
            pa.array([hashlib.md5(p).hexdigest() for p in payloads], type=pa.large_string()),
        )


def resize_images(
    ds: ray.data.Dataset,
    source_col: str = "text",
    width: int = 32,
    height: int = 32,
    batch_size: int = 64,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """payload rows → fixed-size "resized" payloads + metadata (actor
    pool; decode stubbed, plumbing real)."""
    if concurrency is None:
        from kgray.functions.broadcast import auto_concurrency

        concurrency = auto_concurrency()
    with_payload = ds.map_batches(
        lambda t: attach_payload(t, source_col), batch_format="pyarrow"
    )
    return with_payload.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioWindower:
    """Actor-pool audio-windowing stage: one payload row expands to
    overlapping ``window``-byte slices every ``hop`` bytes — the standard
    STFT-style framing a wav2vec/whisper front-end consumes.

    Real audio decode (torchaudio/soundfile) is not available in this
    container, so the "decoder" is the deterministic byte-slice fake; the
    Ray plumbing is real: 1→N overlapping expansion on an actor pool
    (output bytes grow by window/hop ×, so batches stay small), window
    payloads as ``large_binary`` + (index, length, digest) metadata."""

    def __init__(self, window: int = 256, hop: int = 128,
                 max_windows: int | None = None, use_real_decoder: bool = False):
        if use_real_decoder:
            raise NotImplementedError(
                "No audio decode libraries in this environment; "
                "run with use_real_decoder=False for the byte-slice fake."
            )
        self.window = window
        self.hop = hop
        self.max_windows = max_windows

    def __call__(self, batch: pa.Table) -> pa.Table:
        w, h = self.window, self.hop
        ids, idxs, wins, lens, digests = [], [], [], [], []
        id_col = batch.column_names[0]
        for rid, payload in zip(batch[id_col].to_pylist(), batch["payload"].to_pylist()):
            n = -(-len(payload) // h)  # windows start at 0, h, 2h, ... < len
            if self.max_windows is not None:
                n = min(n, self.max_windows)
            for i in range(n):
                chunk = payload[i * h : i * h + w]
                ids.append(rid)
                idxs.append(i)
                wins.append(chunk)
                lens.append(len(chunk))
                digests.append(hashlib.md5(chunk).hexdigest())
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "win_idx": pa.array(idxs, type=pa.int64()),
                "window": pa.array(wins, type=pa.large_binary()),
                "win_len": pa.array(lens, type=pa.int64()),
                "win_md5": pa.array(digests, type=pa.large_string()),
            }
        )


def window_audio(
    ds: ray.data.Dataset,
    source_col: str = "text",
    window: int = 256,
    hop: int = 128,
    max_windows: int | None = None,
    batch_size: int = 64,
    concurrency: int | tuple[int, int] | None = None,
) -> ray.data.Dataset:
    """payload rows → overlapping window rows (1→N expansion with
    window/hop byte inflation; decode stubbed, plumbing real)."""
    if concurrency is None:
        from kgray.functions.broadcast import auto_concurrency

        concurrency = auto_concurrency()
    with_payload = ds.map_batches(
        lambda t: attach_payload(t, source_col), batch_format="pyarrow"
    )
    return with_payload.map_batches(
        AudioWindower,
        fn_constructor_kwargs={"window": window, "hop": hop, "max_windows": max_windows},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
