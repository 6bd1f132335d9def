"""Pure-Python AVI (RIFF) container codec for MJPEG video — the real
container-parsing step of the video frame-sampling path.

An MJPEG AVI is the simplest real video format: a RIFF container whose
``movi`` list holds one complete baseline JPEG per frame (``00dc``
chunks), so the existing JPEG codec (functions/jpegio.py) does the
per-frame image decode and this module does the container walk:
``RIFF('AVI ') → LIST hdrl (avih, LIST strl(strh 'vids'/'MJPG', strf
BITMAPINFOHEADER)) → LIST movi ('00dc'…) → idx1``.

The writer emits a spec-complete file (header metadata, word-aligned
chunks, idx1 index) so the reader is exercised against real structure,
and the reader validates signatures/stream type rather than trusting
offsets — malformed payloads raise, they don't mis-decode.

No external libraries: byte-level struct packing only, same policy as
pdfio/pngio/gifio/jpegio (reference vendors ffmpeg-class tooling the
container lacks; SURVEY §2.8 multimodal columns).
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def write_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """MJPEG frames (each a complete baseline JFIF) → AVI bytes."""
    if not frames:
        raise ValueError("AVI needs at least one frame")
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0,  # dwFlags, wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale, dwRate -> fps frames/sec
            0, len(frames),  # dwStart, dwLength
            max_size, 0xFFFFFFFF, 0,  # bufsize, quality, samplesize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: offsets are relative to the start of the movi list's payload
    # (standard convention: offset of the chunk fourcc, counted from
    # just after the 'movi' type fourcc minus 4 — i.e. first chunk at 4)
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def read_avi_mjpeg(payload: bytes) -> dict:
    """AVI bytes → {'width', 'height', 'n_frames', 'fps', 'frames':
    [jpeg_bytes, ...]}.  Walks the RIFF tree; validates the MJPEG vids
    stream; raises ValueError on anything malformed."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if riff_size + 8 > len(payload):
        raise ValueError("truncated AVI (RIFF size exceeds payload)")

    width = height = n_frames = None
    fps = None
    frames: list[bytes] = []
    saw_mjpeg_stream = False

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal width, height, n_frames, fps, saw_mjpeg_stream
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            data_start = pos + 8
            data_end = data_start + size
            if data_end > end:
                raise ValueError(f"chunk {fourcc!r} overruns its parent")
            if fourcc == b"LIST":
                list_type = buf[data_start : data_start + 4]
                if list_type in (b"hdrl", b"strl", b"movi"):
                    walk(buf, data_start + 4, data_end)
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", buf[data_start : data_start + 56])
                n_frames = vals[4]
                fps = 1_000_000 // vals[0] if vals[0] else 0
                width, height = vals[8], vals[9]
            elif fourcc == b"strh":
                if buf[data_start : data_start + 4] == b"vids":
                    if buf[data_start + 4 : data_start + 8] != b"MJPG":
                        raise ValueError("video stream is not MJPEG")
                    saw_mjpeg_stream = True
            elif fourcc == b"00dc":
                frames.append(buf[data_start:data_end])
            pos = data_end + (size % 2)  # word alignment

    walk(payload, 12, 8 + riff_size)
    if width is None:
        raise ValueError("missing avih header")
    if not saw_mjpeg_stream:
        raise ValueError("no MJPEG video stream declared")
    if n_frames != len(frames):
        raise ValueError(
            f"avih declares {n_frames} frames but movi holds {len(frames)}"
        )
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "fps": fps,
        "frames": frames,
    }
