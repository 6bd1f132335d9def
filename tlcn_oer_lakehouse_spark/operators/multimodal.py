"""Multimodal asset operators: opaque ``binary`` payload columns with
typed metadata, plus Arrow-batched ``mapInPandas`` decode / feature /
frame-sample stages.

The reference stores raw PDFs in object storage and stats/reads them
per-row inside RDD partitions (S7 — transformer.py:570-609, 662-683;
U4/U5).  Here the payload travels as a first-class ``binary`` column
(``spark.read.format("binaryFile")`` at ingest in production; synthetic
UTF-8 payloads in tests), metadata extraction is pure column expressions,
and the Python-side stages are Arrow-vectorized ``mapInPandas`` UDFs —
the idiomatic replacement for the reference's per-row Python loops.

Real decode runs in-repo for pdf/wav/pgm/ppm, PNG (DEFLATE via the
stdlib ``zlib`` — functions/pngio.py walks chunks, inflates IDAT and
unfilters all five scanline filters) *and* baseline JPEG
(functions/jpegio.py — Huffman MCU decode, dequantize, 8×8 IDCT,
YCbCr→RGB); only formats whose codecs truly
aren't in this container (webp/mp3/mp4) stay gated behind
``NotImplementedError``, with ``fake_image_features`` / ``frame_sample``
covering their byte-level plumbing (schemas, Arrow binary round-trip,
1→N row fan-out, per-batch vectorization) end-to-end.

Scale notes: binary payloads stay columnar through Arrow; mapInPandas
processes ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows per
batch with zero driver involvement; frame fan-out multiplies rows inside
the task, so no shuffle is introduced by any stage here.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC_MIME = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"%PDF": "application/pdf",
    b"RIFF": "audio/wav",
}


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    In production the payload comes from ``binaryFile`` ingestion; here it
    is the UTF-8 encoding of a text column, which keeps every downstream
    byte-level operator oracle-checkable (ASCII codes == bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "asset_meta",
        F.struct(
            F.length(payload).alias("size_bytes"),
            F.md5(payload).alias("checksum"),
            F.lit("text/plain").alias("mime_type"),
        ),
    )


def sniff_mime(payload):
    """Magic-byte mime sniffing as a when-ladder over the binary prefix
    (the column-expression analog of the reference's mimetypes guess,
    transformer.py:1641-1652)."""
    expr = F.lit("application/octet-stream")
    for magic, mime in MAGIC_MIME.items():
        expr = F.when(
            F.substring(payload, 1, len(magic)) == F.lit(magic), F.lit(mime)
        ).otherwise(expr)
    return expr


def decode_asset(df: DataFrame, kind: str) -> DataFrame:
    """Real media decode for every uncompressed format, via in-repo
    pure-Python codecs (no external libraries):

    - ``pdf``  — functions/pdfio.py (page tree, FlateDecode, Tj/TJ text)
      with the reference's normalization (transformer.py:689-709);
    - ``wav``  — functions/wavio.py (RIFF chunk walk, 16-bit PCM) →
      per-asset audio features;
    - ``pgm``/``ppm`` — functions/netpbm.py (binary netpbm raster) →
      per-asset image features;
    - ``png`` — functions/pngio.py (chunk walk, stdlib-zlib IDAT
      inflate, all 5 scanline unfilters, palette expansion) → the same
      image features: real *compressed* raster decode;
    - ``jpeg`` — functions/jpegio.py (baseline JFIF: marker walk,
      DQT/DHT parsing, interleaved Huffman MCU decode, dequantize,
      8×8 IDCT, YCbCr→RGB) → the same image features: real *lossy*
      compressed decode;
    - ``gif`` — functions/gifio.py (variable-width LZW decompressor
      with dictionary growth/reset, palette expansion) → the same
      image features;
    - ``avi`` — functions/aviio.py (RIFF container walk, MJPEG stream
      validation) + per-frame jpegio decode → real video frame
      sampling (:func:`video_frame_features`).

    Only codecs that require libraries absent from this container
    (webp/mp3/mp4…) stay an explicit, tested stub — swap in
    PIL/librosa/pyav on a cluster image; the Spark plumbing is the
    same mapInPandas shape as the implemented paths."""
    if kind == "pdf":
        return pdf_page_texts(df)
    if kind == "wav":
        return wav_features(df)
    if kind in ("pgm", "ppm", "png", "jpeg", "jpg", "gif"):
        return image_features(df)
    if kind == "avi":
        return video_frame_features(df)
    if kind == "mp4":
        return mp4_frame_features(df)
    # webp and mp3 are FORMALLY DE-SCOPED for pure-Python pixel/sample
    # decode (COVERAGE.md): webp requires the VP8 boolean arithmetic
    # decoder + loop filter, mp3 the polyphase/MDCT synthesis filterbank
    # — both are DSP engines, not container walks, and a from-spec
    # Python implementation would be neither fast enough to run inside
    # an executor batch nor independently verifiable by a closed-form
    # oracle the way the DC-only JPEG path is.  The container/framing
    # layer of the family IS implemented for real (RIFF/AVI, ISO BMFF
    # MP4 with full sample tables); swap in PIL/librosa/pyav on a
    # cluster image for the pixel/sample step — same mapInPandas shape.
    raise NotImplementedError(
        f"real {kind} decode is de-scoped in pure Python (see COVERAGE.md): "
        "pdf/wav/pgm/ppm/png/jpeg/gif/avi/mp4 decode for real; webp/mp3 "
        "need a codec library (PIL/librosa) on the cluster image"
    )


def pdf_page_texts(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """U5: real PDF text extraction (transformer.py:697-709) as an
    Arrow-batched ``mapInPandas`` stage: binary payload → one row per
    page with normalized text.  The 1→N page fan-out happens inside the
    task — no shuffle; invalid PDFs yield an error row (page_no = -1)
    instead of failing the task, mirroring the reference's per-asset
    try/except."""
    from tlcn_oer_lakehouse_spark.functions.pdfio import (
        normalize_pdf_text,
        read_pdf,
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows: list[dict] = []
            for doc_id, payload in zip(pdf_batch[id_col], pdf_batch[payload_col]):
                try:
                    pages, _outline = read_pdf(bytes(payload))
                    for i, raw in enumerate(pages):
                        rows.append(
                            {
                                id_col: int(doc_id),
                                "page_no": i + 1,
                                "page_text": normalize_pdf_text(raw),
                                "decode_status": "ok",
                            }
                        )
                except Exception as e:  # noqa: BLE001 — per-asset isolation
                    rows.append(
                        {
                            id_col: int(doc_id),
                            "page_no": -1,
                            "page_text": "",
                            "decode_status": f"{type(e).__name__}: {str(e)[:120]}",
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "page_no", "page_text", "decode_status"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        _decode,
        schema=f"{id_col} long, page_no int, page_text string, decode_status string",
    )


def wav_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode (PCM WAV via functions/wavio.py) as an
    Arrow-batched ``mapInPandas`` stage: binary payload → one feature row
    per asset.  Amplitude stats are computed with exact integer sums
    before a single double division/sqrt, so results are bit-identical in
    any engine.  Invalid payloads yield an error row (sample_rate = -1)
    instead of failing the task — per-asset isolation like the PDF path."""
    import math

    from tlcn_oer_lakehouse_spark.functions.wavio import read_wav

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict] = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                try:
                    samples, sr, ch = read_wav(bytes(payload))
                    n = int(samples.size)
                    s64 = samples.astype("int64")
                    sum_sq = int((s64 * s64).sum())
                    rows.append(
                        {
                            id_col: int(doc_id),
                            "sample_rate": sr,
                            "channels": ch,
                            "n_samples": n,
                            "duration_sec": n / (sr * ch) if n else 0.0,
                            "rms_amplitude": math.sqrt(sum_sq / n) if n else 0.0,
                            "peak_amplitude": int(np.abs(s64).max()) if n else 0,
                            "decode_status": "ok",
                        }
                    )
                except Exception as e:  # noqa: BLE001 — per-asset isolation
                    rows.append(
                        {
                            id_col: int(doc_id),
                            "sample_rate": -1, "channels": -1, "n_samples": -1,
                            "duration_sec": 0.0, "rms_amplitude": 0.0,
                            "peak_amplitude": -1,
                            "decode_status": f"{type(e).__name__}: {str(e)[:120]}",
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "channels", "n_samples",
                         "duration_sec", "rms_amplitude", "peak_amplitude",
                         "decode_status"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _decode,
        schema=(
            f"{id_col} long, sample_rate int, channels int, n_samples long, "
            "duration_sec double, rms_amplitude double, peak_amplitude long, "
            "decode_status string"
        ),
    )


def wav_window_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_samples: int = 256,
) -> DataFrame:
    """1→N audio windowing over REAL decoded samples: each asset fans out
    to ``ceil(n / window_samples)`` non-overlapping windows with exact
    per-window energy stats (integer sum-of-squares → one double
    division/sqrt) — the frame layer a VAD / audio-feature pipeline
    builds on.  Fan-out happens inside the task; no shuffle.  Undecodable
    payloads yield a single error row (window_no = -1)."""
    import math

    from tlcn_oer_lakehouse_spark.functions.wavio import read_wav

    def _windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict] = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                try:
                    samples, _sr, _ch = read_wav(bytes(payload))
                    s64 = samples.astype("int64")
                    for k in range(0, max(1, -(-s64.size // window_samples))):
                        seg = s64[k * window_samples : (k + 1) * window_samples]
                        if seg.size == 0:
                            continue
                        sum_sq = int((seg * seg).sum())
                        rows.append(
                            {
                                id_col: int(doc_id),
                                "window_no": k,
                                "n_samples": int(seg.size),
                                "rms": math.sqrt(sum_sq / seg.size),
                                "peak": int(np.abs(seg).max()),
                            }
                        )
                except Exception:  # noqa: BLE001 — per-asset isolation
                    rows.append(
                        {id_col: int(doc_id), "window_no": -1,
                         "n_samples": -1, "rms": 0.0, "peak": -1}
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "window_no", "n_samples", "rms", "peak"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        _windows,
        schema=(
            f"{id_col} long, window_no int, n_samples long, rms double, "
            "peak long"
        ),
    )


def wav_quadrature_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window_samples: int = 256,
) -> DataFrame:
    """Per-window SPECTRAL energy at the three integer-exact DFT bins —
    DC, Nyquist (fs/2) and quadrature (fs/4) — over real decoded PCM.

    At these frequencies the DFT basis is ±1/0-valued (cos/sin of
    multiples of π/2), so the bin powers are pure integer arithmetic:

        P_dc   = (Σ x_i)²
        P_nyq  = (Σ x_i·(-1)^i)²
        P_quad = (Σ x_i·c_i)² + (Σ x_i·s_i)²,  c=[1,0,-1,0…], s=[0,1,0,-1…]

    No transcendental evaluation anywhere — the same trick that makes the
    surprisal and NB operators engine-exact — so a SQL oracle replays the
    spectrum bit-for-bit (general-bin FFT features would be numpy-only
    and rows-only-checkable).  This is the Goertzel filter bank a VAD /
    tone-detection stage uses, restricted to its exactly-representable
    frequencies.  Fan-out is in-task like wav_window_energy."""
    from tlcn_oer_lakehouse_spark.functions.wavio import read_wav

    def _quad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict] = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                try:
                    samples, _sr, _ch = read_wav(bytes(payload))
                    s64 = samples.astype("int64")
                    for k in range(0, max(1, -(-s64.size // window_samples))):
                        seg = s64[k * window_samples : (k + 1) * window_samples]
                        if seg.size == 0:
                            continue
                        i = np.arange(seg.size, dtype=np.int64)
                        sign = 1 - 2 * (i & 1)          # (-1)^i
                        cosq = ((i % 4 == 0).astype(np.int64)
                                - (i % 4 == 2).astype(np.int64))
                        sinq = ((i % 4 == 1).astype(np.int64)
                                - (i % 4 == 3).astype(np.int64))
                        s_dc = int(seg.sum())
                        s_ny = int((seg * sign).sum())
                        s_c = int((seg * cosq).sum())
                        s_s = int((seg * sinq).sum())
                        rows.append({
                            id_col: int(doc_id), "window_no": k,
                            "n_samples": int(seg.size),
                            "p_dc": s_dc * s_dc,
                            "p_nyquist": s_ny * s_ny,
                            "p_quadrature": s_c * s_c + s_s * s_s,
                        })
                except Exception:  # noqa: BLE001 — per-asset isolation
                    rows.append({id_col: int(doc_id), "window_no": -1,
                                 "n_samples": -1, "p_dc": -1,
                                 "p_nyquist": -1, "p_quadrature": -1})
            yield pd.DataFrame(
                rows, columns=[id_col, "window_no", "n_samples",
                               "p_dc", "p_nyquist", "p_quadrature"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        _quad,
        schema=(
            f"{id_col} long, window_no int, n_samples long, p_dc long, "
            "p_nyquist long, p_quadrature long"
        ),
    )


def image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    thumb_side: int = 4,
) -> DataFrame:
    """REAL image decode (binary netpbm via functions/netpbm.py, or PNG
    via functions/pngio.py — sniffed per payload by magic bytes) as an
    Arrow-batched ``mapInPandas`` stage: raster → dimensions, exact mean
    luma (integer sum / pixel count), and nearest-neighbor thumbnail
    dimensions + checksum (the resize path).  Invalid payloads yield an
    error row (width = -1)."""
    from tlcn_oer_lakehouse_spark.functions.netpbm import (
        downsample_nearest,
        read_netpbm,
    )
    from tlcn_oer_lakehouse_spark.functions.gifio import read_gif
    from tlcn_oer_lakehouse_spark.functions.jpegio import read_jpeg
    from tlcn_oer_lakehouse_spark.functions.pngio import read_png

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows: list[dict] = []
            for doc_id, payload in zip(batch[id_col], batch[payload_col]):
                try:
                    raw = bytes(payload)
                    if raw[:4] == b"\x89PNG":
                        px = read_png(raw)
                    elif raw[:2] == b"\xff\xd8":
                        px = read_jpeg(raw)
                    elif raw[:4] == b"GIF8":
                        px = read_gif(raw)
                    else:
                        px = read_netpbm(raw)
                    h, w = px.shape[:2]
                    channels = 1 if px.ndim == 2 else px.shape[2]
                    total = int(px.astype("int64").sum())
                    thumb = downsample_nearest(px, thumb_side)
                    rows.append(
                        {
                            id_col: int(doc_id),
                            "width": w, "height": h, "channels": channels,
                            "mean_luma": total / (w * h * channels),
                            "thumb_width": int(thumb.shape[1]),
                            "thumb_height": int(thumb.shape[0]),
                            # exact integer content check, replayable in
                            # SQL (md5-over-raw-bytes is not: SQL engines
                            # hash VARCHARs, not blobs)
                            "thumb_pixel_sum": int(
                                thumb.astype("int64").sum()
                            ),
                            "thumb_md5": hashlib.md5(
                                thumb.tobytes()
                            ).hexdigest(),
                            "decode_status": "ok",
                        }
                    )
                except Exception as e:  # noqa: BLE001 — per-asset isolation
                    rows.append(
                        {
                            id_col: int(doc_id),
                            "width": -1, "height": -1, "channels": -1,
                            "mean_luma": 0.0, "thumb_width": -1,
                            "thumb_height": -1, "thumb_pixel_sum": -1,
                            "thumb_md5": "",
                            "decode_status": f"{type(e).__name__}: {str(e)[:120]}",
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "channels", "mean_luma",
                         "thumb_width", "thumb_height", "thumb_pixel_sum",
                         "thumb_md5", "decode_status"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _decode,
        schema=(
            f"{id_col} long, width int, height int, channels int, "
            "mean_luma double, thumb_width int, thumb_height int, "
            "thumb_pixel_sum long, thumb_md5 string, decode_status string"
        ),
    )


def fake_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 'decode': width/height from the first two payload
    bytes, brightness = mean byte value (µ over the full payload).
    Arrow-batched mapInPandas — one Python call per Arrow batch, not per
    row."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": [int(p[0]) if len(p) > 0 else 0 for p in payloads],
                    "height": [int(p[1]) if len(p) > 1 else 0 for p in payloads],
                    # exact int-sum / int-len double division — no Python
                    # round() (banker's) vs SQL round() (half-away) skew
                    "brightness": [
                        sum(p) / len(p) if len(p) else 0.0 for p in payloads
                    ],
                    "size_bytes": [len(p) for p in payloads],
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _features,
        schema=f"{id_col} long, width int, height int, brightness double, size_bytes long",
    )


def video_frame_features(
    df: DataFrame, id_col: str = "doc_id", n_sample: int | None = None
) -> DataFrame:
    """REAL video frame sampling: RIFF/AVI container walk
    (functions/aviio.py) → per-frame baseline-JPEG decode
    (functions/jpegio.py) → one feature row per sampled frame
    (frame_no, dimensions, exact mean luma, stream frame count).

    ``n_sample=None`` decodes every frame; an integer decodes
    ``n_sample`` evenly spaced frames (``idx = f * n_total // n_sample``)
    — the sampled-decode path that matters at scale, where decoding
    every frame of every video is the cost driver.  1→N fan-out happens
    inside the task (mapInPandas), no shuffle; a corrupt payload yields
    a single ``decode_status='error'`` row instead of failing the task."""
    from tlcn_oer_lakehouse_spark.functions.aviio import read_avi_mjpeg
    from tlcn_oer_lakehouse_spark.functions.jpegio import read_jpeg

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, ws, hs, lumas, totals, stats = [], [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    meta = read_avi_mjpeg(bytes(p))
                    n_total = meta["n_frames"]
                    if n_sample is None or n_sample >= n_total:
                        idxs = list(range(n_total))
                    else:
                        idxs = sorted({f * n_total // n_sample for f in range(n_sample)})
                    for fno in idxs:
                        arr = read_jpeg(meta["frames"][fno])
                        ids.append(i)
                        fnos.append(fno)
                        hs.append(arr.shape[0])
                        ws.append(arr.shape[1])
                        lumas.append(float(arr.mean()))
                        totals.append(n_total)
                        stats.append("ok")
                except Exception:  # noqa: BLE001 — bad payload ≠ dead task
                    ids.append(i)
                    fnos.append(-1)
                    hs.append(0)
                    ws.append(0)
                    lumas.append(0.0)
                    totals.append(0)
                    stats.append("error")
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(fnos, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                    "n_frames": pd.Series(totals, dtype="int32"),
                    "decode_status": pd.Series(stats, dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _frames,
        schema=(
            f"{id_col} long, frame_no int, width int, height int, "
            "mean_luma double, n_frames int, decode_status string"
        ),
    )


def mp4_frame_features(
    df: DataFrame, id_col: str = "doc_id", n_sample: int | None = None
) -> DataFrame:
    """REAL MP4 frame sampling: ISO BMFF box-tree walk + sample-table
    expansion (functions/mp4io.py: stts/stsc/stsz/stco/stss) → per-frame
    baseline-JPEG decode (functions/jpegio.py) for ``'jpeg'``-codec
    tracks — the MJPEG-in-MP4 twin of :func:`video_frame_features`,
    plus the columns only the MP4 sample tables can provide:
    ``is_sync`` (stss keyframe flag — the "seek to keyframes only"
    primitive) and ``dts`` (decode timestamp in track timescale ticks).

    Tracks whose codec has no pure-Python pixel decoder (avc1/hvc1)
    yield a ``decode_status='unsupported_codec'`` row carrying the
    container metadata that DID parse — at scale that is the honest
    behavior: the sampling/indexing layer works on any MP4, the pixel
    step is pluggable."""
    from tlcn_oer_lakehouse_spark.functions.jpegio import read_jpeg
    from tlcn_oer_lakehouse_spark.functions.mp4io import read_mp4

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                k: [] for k in (
                    "id", "fno", "w", "h", "luma", "total", "sync", "dts",
                    "stat",
                )
            }

            def emit(i, fno, w, h, luma, total, sync, dts, stat):
                rows["id"].append(i)
                rows["fno"].append(fno)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["luma"].append(luma)
                rows["total"].append(total)
                rows["sync"].append(sync)
                rows["dts"].append(dts)
                rows["stat"].append(stat)

            for i, p in zip(pdf[id_col], pdf["payload"]):
                try:
                    meta = read_mp4(bytes(p))
                    n_total = meta["n_frames"]
                    if meta["codec"] != "jpeg":
                        emit(i, -1, meta["width"], meta["height"], 0.0,
                             n_total, False, -1, "unsupported_codec")
                        continue
                    if n_sample is None or n_sample >= n_total:
                        idxs = list(range(n_total))
                    else:
                        idxs = sorted({f * n_total // n_sample
                                       for f in range(n_sample)})
                    for fno in idxs:
                        s = meta["samples"][fno]
                        arr = read_jpeg(meta["frames"][fno])
                        emit(i, fno, arr.shape[1], arr.shape[0],
                             float(arr.mean()), n_total, s["sync"],
                             s["dts"], "ok")
                except Exception:  # noqa: BLE001 — bad payload ≠ dead task
                    emit(i, -1, 0, 0, 0.0, 0, False, -1, "error")
            yield pd.DataFrame(
                {
                    id_col: pd.Series(rows["id"], dtype="int64"),
                    "frame_no": pd.Series(rows["fno"], dtype="int32"),
                    "width": pd.Series(rows["w"], dtype="int32"),
                    "height": pd.Series(rows["h"], dtype="int32"),
                    "mean_luma": pd.Series(rows["luma"], dtype="float64"),
                    "n_frames": pd.Series(rows["total"], dtype="int32"),
                    "is_sync": pd.Series(rows["sync"], dtype="bool"),
                    "dts": pd.Series(rows["dts"], dtype="int64"),
                    "decode_status": pd.Series(rows["stat"], dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _frames,
        schema=(
            f"{id_col} long, frame_no int, width int, height int, "
            "mean_luma double, n_frames int, is_sync boolean, dts long, "
            "decode_status string"
        ),
    )


def frame_sample(
    df: DataFrame, id_col: str = "doc_id", n_frames: int = 4, frame_bytes: int = 64
) -> DataFrame:
    """UDTF-like 1→N frame sampler: ``n_frames`` evenly spaced
    ``frame_bytes``-byte slices per payload (video frame-sampling shape),
    each fingerprinted.  Fan-out happens inside the task — no shuffle."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, offsets, fps = [], [], [], []
            for i, p in zip(pdf[id_col], pdf["payload"]):
                n = len(p)
                if n == 0:
                    continue
                step = max(1, n // n_frames)
                for f in range(n_frames):
                    off = f * step
                    if off >= n:
                        break
                    sl = p[off : off + frame_bytes]
                    ids.append(i)
                    frame_nos.append(f)
                    offsets.append(off)
                    fps.append(hashlib.md5(sl).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(frame_nos, dtype="int32"),
                    "byte_offset": pd.Series(offsets, dtype="int64"),
                    "frame_md5": pd.Series(fps, dtype="object"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _frames,
        schema=f"{id_col} long, frame_no int, byte_offset long, frame_md5 string",
    )


def ingest_binary_dir(
    spark, path: str, pattern: str = "*", id_from_name: bool = True
):
    """S7: real object-store binary ingestion (transformer.py:570-609
    fetched PDFs per-row from MinIO inside RDD partitions; the
    Spark-native form is the ``binaryFile`` source — distributed,
    partition-pruned by path glob, no per-row driver round-trips).

    Emits the standard asset frame: ``doc_id`` (parsed from the file
    stem when ``id_from_name``), ``payload`` (binary content),
    ``asset_meta`` (size/checksum/mime from magic bytes) — the same
    contract `with_binary_payload` produces for synthetic corpora, so
    every downstream decode stage is source-agnostic."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
    stem = F.regexp_extract(F.col("path"), r"([^/]+)\.[^./]+$", 1)
    doc_id = (
        F.regexp_extract(stem, r"(\d+)", 1).cast("long")
        if id_from_name
        else F.abs(F.xxhash64(F.col("path")))
    )
    return raw.select(
        doc_id.alias("doc_id"),
        F.col("path").alias("source_path"),
        F.col("content").alias("payload"),
        F.struct(
            F.col("length").alias("size_bytes"),
            F.md5(F.col("content")).alias("checksum"),
            sniff_mime(F.col("content")).alias("mime_type"),
        ).alias("asset_meta"),
    )
