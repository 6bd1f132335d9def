"""Pure-Python GIF codec — real LZW-compressed image decode with no
external libraries, the third compressed raster format in the in-repo
codec family (pngio: DEFLATE, jpegio: DCT+Huffman, here: LZW).

Decoder: header + logical screen descriptor, global/local color tables,
extension-block skipping, image descriptor, and a full variable-width
LZW decompressor (clear/EOI codes, dictionary growth to 12 bits) over
the sub-block byte stream, indices expanded through the palette to RGB.
Encoder: real LZW compression (greedy longest-match dictionary) of a
palette-indexed raster into a single-frame GIF87a.

Unsupported (raise ``ValueError``): interlaced images, frames smaller
than the logical screen.  Round trips are lossless: GIF palettes are
exact, so encode∘decode is identity on any raster with ≤ 256 distinct
colors — pinned by tests and by the ``mm_gif_decode`` oracle's closed
form.
"""

from __future__ import annotations

import struct

import numpy as np


def _palette(pixels: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (k,3) uint8, indices (h,w)) for a gray or RGB raster."""
    if pixels.ndim == 2:
        rgb = np.stack([pixels] * 3, axis=2)
    else:
        rgb = pixels
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors exceed GIF's 256-entry palette")
    return colors.astype(np.uint8), inverse.reshape(h, w).astype(np.int32)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF is LSB-first
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prefix = b""
    for v in indices.flatten():
        nxt = prefix + bytes([int(v)])
        if nxt in table:
            prefix = nxt
            continue
        emit(table[prefix])
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        elif next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        prefix = bytes([int(v)])
    if prefix:
        emit(table[prefix])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read_code(size: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < size:
            if pos >= len(data):
                raise ValueError("LZW stream exhausted")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << size) - 1)
        acc >>= size
        nbits -= size
        return code

    out = bytearray()
    table: list[bytes] = []
    code_size = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(code_size)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        if prev is not None and len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(f"LZW underrun: {len(out)} of {n_pixels} pixels")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def write_gif(pixels: np.ndarray) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB (≤256 distinct colors) →
    single-frame GIF87a with real LZW compression."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim not in (2, 3) or (arr.ndim == 3 and arr.shape[2] != 3):
        raise ValueError(f"unsupported raster shape {arr.shape}")
    palette, indices = _palette(arr)
    h, w = indices.shape
    gct_bits = max(1, (max(2, len(palette)) - 1).bit_length())
    gct_size = 1 << gct_bits
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (gct_bits - 1), 0, 0])  # GCT flag + size, bg, aspect
    table = np.zeros((gct_size, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    min_code = max(2, gct_bits)
    out += bytes([min_code])
    stream = _lzw_encode(indices, min_code)
    for i in range(0, len(stream), 255):
        block = stream[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def read_gif(payload: bytes) -> np.ndarray:
    """Single-frame GIF bytes → uint8 (h, w, 3) RGB raster."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    w, h = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 1 << ((flags & 0x07) + 1)
        gct = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos)
        gct = gct.reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            raise ValueError("GIF contains no image data")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block 0x{block:02X}")
        left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
        iflags = payload[pos + 9]
        pos += 10
        if iflags & 0x40:
            raise ValueError("interlaced GIF unsupported")
        if (left, top, iw, ih) != (0, 0, w, h):
            raise ValueError("partial-frame GIF unsupported")
        lct = gct
        if iflags & 0x80:
            n = 1 << ((iflags & 0x07) + 1)
            lct = np.frombuffer(
                payload, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if lct is None:
            raise ValueError("no color table")
        min_code = payload[pos]
        pos += 1
        stream = bytearray()
        while payload[pos] != 0:
            size = payload[pos]
            stream += payload[pos + 1 : pos + 1 + size]
            pos += 1 + size
        indices = _lzw_decode(bytes(stream), min_code, w * h)
        return lct[indices.reshape(h, w)]
    raise ValueError("truncated GIF")
