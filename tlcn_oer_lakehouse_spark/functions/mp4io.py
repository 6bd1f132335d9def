"""Pure-Python ISO BMFF (MP4, ISO/IEC 14496-12) container codec for
MJPEG video — closes the mp4 branch of the container-format trio the
round-4 review flagged (webp/mp3/mp4).

MP4 is a box (atom) tree: every box is ``uint32 size (big-endian) +
4-byte type + payload``; container boxes nest child boxes, leaf boxes
carry tables.  Frame data lives in ``mdat``; everything needed to FIND
a frame lives in the sample tables under
``moov/trak/mdia/minf/stbl``:

- ``stsd``  sample description (codec fourcc + visual dimensions)
- ``stts``  decode-time deltas, run-length encoded
- ``stsc``  sample→chunk mapping, run-length encoded
- ``stsz``  per-sample byte sizes
- ``stco``  absolute chunk file offsets
- ``stss``  sync (key) sample numbers — absent means "all sync"

The writer emits a spec-complete single-track video file using the
``'jpeg'`` visual sample entry (QuickTime/ISO MJPEG: each sample is a
complete baseline JFIF image), so the reader is exercised against real
structure, and the existing JPEG codec (functions/jpegio.py) does the
per-frame pixel decode — the same division of labor as the AVI path
(functions/aviio.py).  The reader walks the box tree, expands the
run-length sample tables into per-sample (offset, size, sync, dts)
records, and validates sizes/signatures rather than trusting offsets.

Samples whose codec is H.264/HEVC (``avc1``/``hvc1`` sample entries)
parse fine at the container level but have no pure-Python pixel
decoder here — read_mp4 surfaces the fourcc and the caller gates
(operators/multimodal.py).  No external libraries: byte-level struct
packing only, same policy as pdfio/pngio/gifio/jpegio/aviio.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"dinf", b"stbl"}


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def write_mp4_mjpeg(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    sync_every: int = 2,
) -> bytes:
    """MJPEG frames (each a complete baseline JFIF) → MP4 bytes.
    Every ``sync_every``-th frame is marked as a sync sample in
    ``stss`` (frame 1 always is), exercising the keyframe table."""
    if not frames:
        raise ValueError("MP4 needs at least one frame")
    if sync_every < 1:
        raise ValueError(f"sync_every must be >= 1, got {sync_every}")
    timescale = fps
    duration = len(frames)  # one tick per frame at timescale=fps

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isommp41")

    # mdat immediately follows ftyp; chunk offsets are absolute, so lay
    # out mdat BEFORE moov and compute the first-frame offset now
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    first_frame_off = len(ftyp) + 8  # mdat header is 8 bytes

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iHH", 0x00010000, 0x0100, 0)  # rate, volume, rsvd
        + struct.pack(">II", 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in movie | in preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + struct.pack(">II", 0, 0)
        + struct.pack(">hhhH", 0, 0, 0, 0)  # layer, alt group, volume, rsvd
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', predefined
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + struct.pack(">III", 0, 0, 0)
        + b"VideoHandler\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(
        b"dref", 0, 0,
        struct.pack(">I", 1) + _full(b"url ", 0, 1, b""),  # self-contained
    )
    dinf = _box(b"dinf", dref)

    sample_entry = _box(
        b"jpeg",
        struct.pack(">6xH", 1)  # 6 reserved bytes + data_reference_index
        + struct.pack(">HH", 0, 0)  # predefined, reserved
        + struct.pack(">III", 0, 0, 0)  # predefined[3]
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)  # reserved
        + struct.pack(">H", 1)  # frame_count
        + b"\x05mjpeg" + b"\x00" * 26  # 32-byte pascal compressorname
        + struct.pack(">Hh", 24, -1),  # depth, predefined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(
        b"stts", 0, 0, struct.pack(">III", 1, len(frames), 1)
    )  # one run: every sample lasts 1 tick
    stsc = _full(
        b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(frames), 1)
    )  # one chunk holding all samples
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(frames))
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_frame_off))
    syncs = [i + 1 for i in range(len(frames)) if i % sync_every == 0]
    stss = _full(
        b"stss", 0, 0,
        struct.pack(">I", len(syncs))
        + b"".join(struct.pack(">I", s) for s in syncs),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(buf: bytes, pos: int, end: int, found: dict) -> None:
    while pos + 8 <= end:
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        btype = buf[pos + 4 : pos + 8]
        if size == 1:  # 64-bit largesize
            size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
            body = pos + 8
        else:
            body = pos + 8
        if pos + size > end:
            raise ValueError(f"box {btype!r} overruns its parent")
        if btype == b"trak":
            # First-wins must be per TRACK, not per leaf box: recursing
            # into a second trak would silently mix one track's
            # stsd/stsz with another's stts/stss.  Only the first trak
            # subtree is captured; later traks are skipped wholesale.
            if not found.get("_trak_seen"):
                found["_trak_seen"] = True
                _walk(buf, body, pos + size, found)
        elif btype in _CONTAINERS:
            _walk(buf, body, pos + size, found)
        else:
            found.setdefault(btype, buf[body : pos + size])
        pos += size


def _u32s(payload: bytes, off: int, n: int) -> list[int]:
    if off + 4 * n > len(payload):
        raise ValueError(
            f"table declares {n} entries but box payload holds "
            f"{max(0, (len(payload) - off)) // 4}"
        )
    return list(struct.unpack(f">{n}I", payload[off : off + 4 * n]))


def _expand_stsc(runs: list[tuple[int, int, int]], n_chunks: int) -> list[int]:
    """Expand stsc (first_chunk, samples_per_chunk, desc) runs into a
    per-chunk sample count, clamped to the VALIDATED chunk count: the
    gap between consecutive first_chunk values is attacker-controlled
    32-bit data, so an unclamped ``last - first + 1`` expansion can
    demand ~2^32 list entries from a ~120-byte payload (same
    hostile-count class as the stsz/stts bounds in ``read_mp4``).
    Chunks beyond stco's n_chunks can never be read, so they are never
    materialized either.

    A valid stsc run table is 1-based and contiguous (first run covers
    chunk 1; each later run starts where the previous ended).  A run
    whose first_chunk skips ahead (e.g. a single run starting at chunk
    3) used to be applied positionally from chunk 1, silently shifting
    every sample offset — the same silent-misparse class as the
    hostile-count bounds above, so it raises instead."""
    if n_chunks <= 0:
        # stco declares no chunks: nothing is readable and no run can
        # cover anything — return the empty expansion rather than
        # tripping the contiguity check on runs past the (empty) table
        return []
    per_chunk: list[int] = []
    for i, (first, spc, _desc) in enumerate(runs):
        if first != len(per_chunk) + 1:
            raise ValueError(
                f"malformed stsc: run {i} first_chunk={first}, expected "
                f"{len(per_chunk) + 1} (run table must be 1-based and contiguous)"
            )
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        last = min(last, n_chunks)
        if first > last:
            continue
        per_chunk.extend([spc] * (last - first + 1))
        if len(per_chunk) >= n_chunks:
            del per_chunk[n_chunks:]
            break
    return per_chunk


def read_mp4(payload: bytes) -> dict:
    """MP4 bytes → {'width', 'height', 'codec', 'timescale',
    'duration', 'n_frames', 'samples': [{'offset', 'size', 'sync',
    'dts'}...], 'frames': [bytes, ...] (only when codec == 'jpeg')}.

    Expands the run-length stts/stsc tables to per-sample records and
    resolves absolute offsets from stco + cumulative within-chunk
    sizes; raises ValueError on malformed structure."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF payload (missing ftyp)")
    found: dict = {}
    _walk(payload, 0, len(payload), found)
    for req in (b"mvhd", b"tkhd", b"mdhd", b"stsd", b"stts", b"stsc",
                b"stsz", b"stco"):
        if req not in found:
            raise ValueError(f"missing required box {req!r}")

    mdhd = found[b"mdhd"]
    if mdhd[0] != 0:
        raise ValueError("mdhd version 1 not supported")
    timescale, duration = struct.unpack(">II", mdhd[12:20])

    tkhd = found[b"tkhd"]
    width = struct.unpack(">I", tkhd[-8:-4])[0] >> 16
    height = struct.unpack(">I", tkhd[-4:])[0] >> 16

    stsd = found[b"stsd"]
    n_entries = struct.unpack(">I", stsd[4:8])[0]
    if n_entries < 1:
        raise ValueError("empty stsd")
    codec = stsd[12:16].decode("latin-1")

    # stsz → per-sample sizes.  Declared counts are attacker/corruption
    # controlled 32-bit ints — bound every one against the payload
    # BEFORE expanding so a ~100-byte crafted file declaring counts
    # near 2^32 raises ValueError instead of forcing a multi-GB
    # allocation (a MemoryError would escape the per-row try/except in
    # mp4_frame_features and kill the executor).
    stsz = found[b"stsz"]
    fixed_size, n_samples = struct.unpack(">II", stsz[4:12])
    if n_samples > len(payload):
        raise ValueError(
            f"stsz declares {n_samples} samples for a {len(payload)}-byte file"
        )
    if fixed_size:
        if fixed_size * n_samples > len(payload):
            raise ValueError(
                f"stsz declares {n_samples}x{fixed_size}-byte samples "
                f"exceeding the {len(payload)}-byte file"
            )
        sizes = [fixed_size] * n_samples
    else:
        sizes = _u32s(stsz, 12, n_samples)

    # stts → per-sample decode timestamps
    stts = found[b"stts"]
    (n_runs,) = struct.unpack(">I", stts[4:8])
    if 8 + 8 * n_runs > len(stts):
        raise ValueError(f"stts declares {n_runs} runs beyond its box")
    dts, t = [], 0
    for i in range(n_runs):
        cnt, delta = struct.unpack(">II", stts[8 + 8 * i : 16 + 8 * i])
        if len(dts) + cnt > n_samples:
            raise ValueError(
                f"stts run of {cnt} overruns the {n_samples} declared samples"
            )
        for _ in range(cnt):
            dts.append(t)
            t += delta
    if len(dts) != n_samples:
        raise ValueError(
            f"stts covers {len(dts)} samples but stsz declares {n_samples}"
        )

    # stco + stsc → per-sample absolute offsets
    stco = found[b"stco"]
    (n_chunks,) = struct.unpack(">I", stco[4:8])
    chunk_offsets = _u32s(stco, 8, n_chunks)
    stsc = found[b"stsc"]
    (n_stsc,) = struct.unpack(">I", stsc[4:8])
    if 8 + 12 * n_stsc > len(stsc):
        raise ValueError(f"stsc declares {n_stsc} runs beyond its box")
    runs = [struct.unpack(">III", stsc[8 + 12 * i : 20 + 12 * i])
            for i in range(n_stsc)]
    per_chunk = _expand_stsc(runs, n_chunks)
    offsets = []
    si = 0
    for ci, base in enumerate(chunk_offsets):
        off = base
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= n_samples:
                break
            offsets.append(off)
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError(
            f"chunk map resolves {si} samples but stsz declares {n_samples}"
        )

    # stss → sync set (absent = every sample is sync)
    if b"stss" in found:
        stss = found[b"stss"]
        (n_sync,) = struct.unpack(">I", stss[4:8])
        sync = set(_u32s(stss, 8, n_sync))
    else:
        sync = set(range(1, n_samples + 1))

    samples = []
    for i in range(n_samples):
        if offsets[i] + sizes[i] > len(payload):
            raise ValueError(f"sample {i} overruns the file")
        samples.append(
            {"offset": offsets[i], "size": sizes[i],
             "sync": (i + 1) in sync, "dts": dts[i]}
        )
    out = {
        "width": width,
        "height": height,
        "codec": codec,
        "timescale": timescale,
        "duration": duration,
        "n_frames": n_samples,
        "samples": samples,
    }
    if codec == "jpeg":
        out["frames"] = [
            payload[s["offset"] : s["offset"] + s["size"]] for s in samples
        ]
    return out
