"""Multimodal plumbing: binary payload round-trip through Arrow,
mapInPandas batch shape, 1→N frame fan-out, and the explicit decode stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tlcn_oer_lakehouse_spark.operators.multimodal import (
    decode_asset,
    fake_image_features,
    frame_sample,
    sniff_mime,
    with_binary_payload,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return with_binary_payload(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).persist()


def test_payload_is_binary_and_checksummed(spark, docs):
    row = docs.select("text", "payload", "asset_meta").first()
    assert isinstance(row.payload, bytearray | bytes)
    assert bytes(row.payload) == row.text.encode("utf-8")
    assert row.asset_meta.checksum == hashlib.md5(row.text.encode()).hexdigest()
    assert row.asset_meta.size_bytes == len(row.text.encode())


def test_sniff_mime_magic_bytes(spark):
    df = spark.createDataFrame(
        [(b"\x89PNG\r\n", ), (b"\xff\xd8\xff\xe0", ), (b"%PDF-1.7", ), (b"hello", )],
        ["payload"],
    )
    got = [r.mime for r in df.select(sniff_mime(F.col("payload")).alias("mime")).collect()]
    assert got == ["image/png", "image/jpeg", "application/pdf", "application/octet-stream"]


def test_decode_stub_raises(docs):
    with pytest.raises(NotImplementedError):
        decode_asset(docs, "image")


def test_descope_gate_names_rationale(docs):
    """webp/mp3 are formally de-scoped (COVERAGE.md) — the gate must say
    where the rationale lives and what IS implemented."""
    for kind in ("webp", "mp3"):
        with pytest.raises(NotImplementedError, match="de-scoped.*COVERAGE"):
            decode_asset(docs, kind)


def test_fake_features_schema_and_values(docs):
    feats = fake_image_features(docs, "doc_id")
    assert [f.name for f in feats.schema.fields] == [
        "doc_id", "width", "height", "brightness", "size_bytes",
    ]
    row = feats.join(docs.select("doc_id", "text"), "doc_id").first()
    b = row.text.encode()
    assert row.width == b[0] and row.height == b[1]
    assert row.brightness == pytest.approx(sum(b) / len(b), abs=0)


def test_frame_sample_fanout(docs):
    frames = frame_sample(docs, "doc_id", n_frames=4, frame_bytes=64)
    per_doc = frames.groupBy("doc_id").count()
    # every payload ≥4 bytes yields exactly 4 frames
    n_docs = docs.count()
    assert per_doc.filter(F.col("count") == 4).count() == n_docs
    # frame fingerprint matches a locally computed slice
    one = frames.filter((F.col("doc_id") == 0) & (F.col("frame_no") == 1)).first()
    text = docs.filter(F.col("doc_id") == 0).first().text.encode()
    step = max(1, len(text) // 4)
    assert one.byte_offset == step
    assert one.frame_md5 == hashlib.md5(text[step : step + 64]).hexdigest()


def test_s7_binaryfile_ingest_to_pdf_decode(spark, tmp_path):
    """S7 end-to-end on the REAL binaryFile source: PDFs written to a
    directory, ingested via spark.read.format('binaryFile'), mime
    sniffed from magic bytes, decoded back to page text."""
    from tlcn_oer_lakehouse_spark.functions.pdfio import write_pdf
    from tlcn_oer_lakehouse_spark.operators.multimodal import (
        ingest_binary_dir,
        pdf_page_texts,
    )

    d = tmp_path / "assets"
    d.mkdir()
    (d / "doc_101.pdf").write_bytes(write_pdf([["alpha beta"], ["gamma"]]))
    (d / "doc_102.pdf").write_bytes(write_pdf([["delta"]], compress=True))
    (d / "ignore.txt").write_text("not a pdf")

    assets = ingest_binary_dir(spark, str(d), pattern="*.pdf")
    rows = {r.doc_id: r for r in assets.collect()}
    assert set(rows) == {101, 102}
    assert all(r.asset_meta.mime_type == "application/pdf" for r in rows.values())
    assert rows[101].asset_meta.size_bytes == len((d / "doc_101.pdf").read_bytes())

    pages = pdf_page_texts(assets).orderBy("doc_id", "page_no").collect()
    assert [(p.doc_id, p.page_no, p.page_text) for p in pages] == [
        (101, 1, "alpha beta"), (101, 2, "gamma"), (102, 1, "delta"),
    ]
