"""Pure-numpy media codecs for the sandbox-feasible real-decode path
(VERDICT r4 #4): 24-bit BMP (BITMAPINFOHEADER, BI_RGB, bottom-up rows,
4-byte row padding — the Windows bitmap format as publicly documented),
binary PPM (netpbm P6), and PCM16 mono WAV (RIFF/WAVE fmt+data chunks).

These are complete, deterministic encoders/decoders for the simplest
profile of each public format — enough to make the multimodal stages
decode REAL bytes end-to-end without PIL/torchaudio.  Exotic codecs
(JPEG/PNG/FLAC/...) stay behind the library gate in ops/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- BMP ----


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> 24-bit uncompressed BMP bytes (BI_RGB).

    Rows are stored bottom-up, as BGR triplets, each row padded to a
    4-byte boundary — the canonical Windows DIB layout."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected HxWx3 RGB array")
    h, w = px.shape[:2]
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    img_size = stride * h
    # pixel array: flip vertically (bottom-up), RGB -> BGR, pad rows
    bgr = px[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_raw] = bgr.reshape(h, row_raw)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> HxWx3 uint8 RGB array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0 or planes != 1:
        raise ValueError("only 24-bit BI_RGB BMP is supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    bgr = rows[::-1] if flip else rows
    return bgr[:, :, ::-1].copy()


# ---------------------------------------------------------------- PPM ----


def encode_ppm(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> binary PPM (netpbm P6, maxval 255)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected HxWx3 RGB array")
    h, w = px.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes -> HxWx3 uint8 RGB array.  Handles the
    whitespace/comment grammar of the netpbm header."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only maxval 255 PPM is supported")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


# ---------------------------------------------------------------- WAV ----


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """1-D int16 sample array -> PCM16 mono RIFF/WAVE bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise ValueError("expected 1-D int16 samples")
    data = s.tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM16 mono RIFF/WAVE bytes -> (int16 samples, sample rate).
    Walks the chunk list, so extra chunks (LIST/INFO) are tolerated."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono WAV is supported")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=size // 2, offset=body)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples.astype(np.int16, copy=True), int(rate)


# --------------------------------------------- nearest-neighbor resize ----


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Integer-exact nearest-neighbor resize: source index for output
    column x is ``(x * W_in) // W_out`` (floor), same for rows — the
    convention the DuckDB twin reproduces with integer division."""
    h, w = pixels.shape[:2]
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    return pixels[ys][:, xs]
