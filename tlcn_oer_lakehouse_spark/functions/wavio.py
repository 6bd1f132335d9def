"""Pure-Python/numpy PCM WAV codec — REAL audio decode with no external
codec libraries, the audio analog of the in-repo PDF codec
(functions/pdfio.py).  The reference treats media as opaque object-store
payloads (transformer.py:570-609); here uncompressed RIFF/WAVE with
16-bit PCM decodes for real inside executors, and only *compressed*
audio (mp3/ogg/aac) remains gated behind NotImplementedError in
``operators.multimodal.decode_asset``.

Format notes: RIFF container = 'RIFF' <u32 size> 'WAVE' then chunks
('<id:4s> <u32 size> <payload>', word-aligned).  We walk chunks rather
than assuming fmt/data offsets — real encoders interleave LIST/fact
chunks.  Only audio_format=1 (PCM) with 16-bit samples is accepted;
anything else raises ValueError (caller maps it to an error row).
"""

from __future__ import annotations

import struct

import numpy as np


def write_wav(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """int16 samples (frame-interleaved if multi-channel) → WAV bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate,
        block_align, 16,
    )
    data_hdr = struct.pack("<4sI", b"data", len(data))
    riff_size = 4 + len(fmt) + len(data_hdr) + len(data)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data_hdr + data


def read_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes → (int16 sample array, sample_rate, channels).

    Multi-channel data stays interleaved (length = frames × channels),
    matching what ``write_wav`` accepts — a lossless round-trip.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = channels = bits = None
    data: bytes | None = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_format != 1:
                raise ValueError(f"unsupported audio_format={audio_format} (PCM only)")
            if bits != 16:
                raise ValueError(f"unsupported bits_per_sample={bits} (16 only)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return np.frombuffer(data, dtype="<i2"), sample_rate, channels
