"""Pure-Python/numpy netpbm (PGM/PPM) image codec — REAL image decode
with no external codec libraries, the image analog of the in-repo PDF
codec (functions/pdfio.py).  Uncompressed grayscale (P5) and RGB (P6)
rasters decode for real inside executors; only *compressed* images
(jpeg/png/webp) remain gated behind NotImplementedError in
``operators.multimodal.decode_asset``.

Header grammar: magic, whitespace/comments, width, height, maxval, ONE
whitespace byte, then raw raster (row-major; P6 interleaves RGB).  Only
maxval ≤ 255 (1 byte per channel value) is accepted.
"""

from __future__ import annotations

import numpy as np


def write_pgm(pixels: np.ndarray) -> bytes:
    """2-D uint8 array (h, w) → P5 bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()


def write_ppm(pixels: np.ndarray) -> bytes:
    """3-D uint8 array (h, w, 3) → P6 bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 3:
        raise ValueError("P6 requires 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _read_header_token(payload: bytes, pos: int) -> tuple[int, int]:
    """Skip whitespace and '#' comments, read one ASCII integer."""
    n = len(payload)
    while pos < n:
        ch = payload[pos : pos + 1]
        if ch == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and payload[pos : pos + 1].isdigit():
        pos += 1
    if start == pos:
        raise ValueError("malformed netpbm header")
    return int(payload[start:pos]), pos


def read_netpbm(payload: bytes) -> np.ndarray:
    """P5 → uint8 (h, w); P6 → uint8 (h, w, 3)."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload (magic={magic!r})")
    w, pos = _read_header_token(payload, 2)
    h, pos = _read_header_token(payload, pos)
    maxval, pos = _read_header_token(payload, pos)
    if maxval > 255:
        raise ValueError(f"unsupported maxval={maxval} (1-byte samples only)")
    pos += 1  # exactly one whitespace byte separates header from raster
    channels = 1 if magic == b"P5" else 3
    need = w * h * channels
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"truncated raster: need {need}, got {len(raster)}")
    arr = np.frombuffer(raster, dtype=np.uint8)
    return arr.reshape((h, w) if channels == 1 else (h, w, 3))


def downsample_nearest(pixels: np.ndarray, max_side: int) -> np.ndarray:
    """Nearest-neighbor thumbnail: keep every k-th pixel, k =
    ceil(max(h, w) / max_side) — output dims ceil(h/k) × ceil(w/k).
    Pure striding, no interpolation: deterministic and replayable in SQL
    (pixel (x, y) of the thumb is pixel (x*k, y*k) of the source)."""
    h, w = pixels.shape[:2]
    k = max(1, -(-max(h, w) // max_side))
    return pixels[::k, ::k]
