"""Minimal pure-Python PDF codec — real bytes, no external libraries.

The reference's content path decodes stored PDFs with PyPDF2
(transformer.py:697-709 ``_extract_pdf_page_texts``) and normalizes the
text (transformer.py:689-696 ``_normalize_pdf_text``).  No PDF library
ships in this container, so this module implements the subset of
ISO 32000 the pipeline needs, from scratch:

- ``write_pdf``: spec-conformant writer — object table, xref, catalog,
  page tree, Helvetica text via ``BT/Tf/Td/Tj/ET`` content streams,
  optional FlateDecode compression (zlib), optional ``/Outlines``
  bookmark tree with page destinations.  Output opens in any viewer.
- ``read_pdf``: parser — object scan, stream extraction with
  FlateDecode, page-tree walk (ordered ``/Kids`` recursion), text
  extraction from ``Tj/TJ/'/"`` operators inside ``BT..ET`` blocks with
  PDF string-escape and hex-string decoding, outline walk
  (``/First``/``/Next`` chain with ``/Dest`` page resolution).

The parser is deliberately tolerant (object scan instead of strict xref
chasing) so it reads real-world simple PDFs, not only its own output;
the writer round-trips through the parser byte-exactly, which is what
the oracle-checked queries rely on.

Executor-importable: used inside ``mapInPandas`` stages
(operators/multimodal.py, operators/toc.py) — plain functions over
``bytes``, no Spark imports.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_stream(lines: list[str]) -> bytes:
    ops = ["BT", "/F1 11 Tf", "12 TL", "72 720 Td"]
    for i, line in enumerate(lines):
        if i > 0:
            ops.append("T*")
        ops.append(f"({_esc(line)}) Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1", "replace")


def write_pdf(
    pages: list[list[str]],
    outline: list[tuple[int, str, int]] | None = None,
    compress: bool = False,
) -> bytes:
    """Build a complete PDF.

    ``pages``: list of pages, each a list of text lines.
    ``outline``: optional bookmarks as (level, title, 1-based page_no).
    ``compress``: FlateDecode the content streams.
    """
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    # object layout: 1 catalog, 2 pages-root, 3 font,
    # 4..3+n pages, 4+n..3+2n contents, then outline objects
    page_obj = [4 + i for i in range(n_pages)]
    cont_obj = [4 + n_pages + i for i in range(n_pages)]
    next_obj = 4 + 2 * n_pages

    kids = " ".join(f"{o} 0 R" for o in page_obj)
    cat_extra = ""
    if outline:
        cat_extra = f" /Outlines {next_obj} 0 R"
    objs[1] = f"<< /Type /Catalog /Pages 2 0 R{cat_extra} >>".encode()
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    for i in range(n_pages):
        objs[page_obj[i]] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cont_obj[i]} 0 R >>"
        ).encode()
        data = _content_stream(pages[i])
        filt = ""
        if compress:
            data = zlib.compress(data)
            filt = " /Filter /FlateDecode"
        objs[cont_obj[i]] = (
            f"<< /Length {len(data)}{filt} >>\nstream\n".encode()
            + data
            + b"\nendstream"
        )

    if outline:
        root = next_obj
        first_item = root + 1
        item_ids = [first_item + i for i in range(len(outline))]
        objs[root] = (
            f"<< /Type /Outlines /First {item_ids[0]} 0 R "
            f"/Last {item_ids[-1]} 0 R /Count {len(outline)} >>"
        ).encode()
        for i, (_level, title, page_no) in enumerate(outline):
            parts = [f"<< /Title ({_esc(title)})", f"/Parent {root} 0 R"]
            if i > 0:
                parts.append(f"/Prev {item_ids[i - 1]} 0 R")
            if i < len(outline) - 1:
                parts.append(f"/Next {item_ids[i + 1]} 0 R")
            pg = page_obj[min(max(page_no, 1), n_pages) - 1]
            parts.append(f"/Dest [{pg} 0 R /Fit] >>")
            objs[item_ids[i]] = " ".join(parts).encode()

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    max_obj = max(objs)
    out += f"xref\n0 {max_obj + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max_obj + 1):
        out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {max_obj + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """All indirect objects as {number: body-bytes} via a tolerant scan
    (no strict xref chasing — survives files with stale xref tables)."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        start = m.end()
        end = data.find(b"endobj", start)
        if end == -1:
            continue
        # stream bodies may contain 'endobj' bytes when compressed: extend
        # the window to the endstream if a stream starts before our end
        s = data.find(b"stream", start)
        if s != -1 and s < end:
            es = data.find(b"endstream", s)
            if es != -1:
                end = data.find(b"endobj", es)
                if end == -1:
                    end = es
        objs[int(m.group(1))] = data[start:end]
    return objs


def _dict_part(body: bytes) -> bytes:
    i = body.find(b"stream")
    return body[:i] if i != -1 else body


def _stream_data(body: bytes) -> bytes | None:
    i = body.find(b"stream")
    if i == -1:
        return None
    j = i + len(b"stream")
    if body[j : j + 2] == b"\r\n":
        j += 2
    elif body[j : j + 1] == b"\n":
        j += 1
    # slice by /Length when sane — compressed payloads can legitimately
    # END in 0x0A/0x0D bytes, so blind EOL-stripping corrupts them
    k = body.rfind(b"endstream")
    lm = re.search(rb"/Length\s+(\d+)", _dict_part(body))
    if lm and j + int(lm.group(1)) <= k:
        data = body[j : j + int(lm.group(1))]
    else:
        data = body[j:k]
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith((b"\n", b"\r")):
            data = data[:-1]
    if b"/FlateDecode" in _dict_part(body):
        data = zlib.decompress(data)
    return data


def _refs(body: bytes, key: bytes) -> list[int]:
    """Object numbers referenced by ``/Key`` (single ref or array)."""
    m = re.search(re.escape(key) + rb"\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", body)
    if not m:
        return []
    return [int(r.group(1)) for r in _REF_RE.finditer(m.group(1))]


def _decode_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash
            nxt = raw[i + 1]
            esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                   0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal escape, up to 3 digits
                j = i + 1
                oct_digits = b""
                while j < len(raw) and len(oct_digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    oct_digits += bytes([raw[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
                continue
            if nxt == 0x0A:  # line continuation
                i += 2
                continue
        out.append(c)
        i += 1
    return out.decode("latin-1")


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"  # literal string
    rb"|<[0-9A-Fa-f\s]*>"  # hex string
    rb"|\[(?:[^\]\\]|\\.)*\]"  # array (for TJ)
    rb"|[A-Za-z'\"*]+"  # operator
)


def _extract_text_from_stream(data: bytes) -> str:
    """Tj / TJ / ' / " text extraction with line breaks on Td/TD/T*."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[bytes] = []

    def flush_line() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    def strings_in(tok: bytes) -> list[str]:
        out = []
        for sm in re.finditer(rb"\((?:[^()\\]|\\.)*\)", tok):
            out.append(_decode_pdf_string(sm.group(0)[1:-1]))
        for hm in re.finditer(rb"<([0-9A-Fa-f\s]*)>", tok):
            hx = re.sub(rb"\s", b"", hm.group(1))
            if len(hx) % 2:
                hx += b"0"
            out.append(bytes.fromhex(hx.decode()).decode("latin-1"))
        return out

    for m in _TOKEN_RE.finditer(data):
        tok = m.group(0)
        if tok.startswith((b"(", b"<", b"[")):
            pending.append(tok)
            continue
        op = tok
        if op in (b"Tj", b"TJ"):
            for p in pending:
                cur.extend(strings_in(p))
            pending.clear()
        elif op in (b"'", b'"'):
            flush_line()
            for p in pending:
                cur.extend(strings_in(p))
            pending.clear()
        elif op in (b"Td", b"TD", b"T*"):
            flush_line()
            pending.clear()
        elif op == b"ET":
            flush_line()
            pending.clear()
        else:
            pending.clear()
    flush_line()
    return "\n".join(lines)


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Ordered page object numbers via the /Root -> /Pages -> /Kids walk."""
    catalog = None
    for num, body in objs.items():
        if b"/Type" in body and b"/Catalog" in _dict_part(body):
            catalog = num
            break
    if catalog is None:
        # fallback: every /Type /Page in object-number order
        return sorted(
            n for n, b in objs.items()
            if re.search(rb"/Type\s*/Page\b", _dict_part(b))
        )
    pages_root = _refs(objs[catalog], b"/Pages")
    order: list[int] = []

    def walk(num: int) -> None:
        body = objs.get(num)
        if body is None:
            return
        head = _dict_part(body)
        if re.search(rb"/Type\s*/Page\b", head) and b"/Kids" not in head:
            order.append(num)
            return
        for kid in _refs(head, b"/Kids"):
            walk(kid)

    for r in pages_root:
        walk(r)
    return order


def read_pdf(data: bytes) -> tuple[list[str], list[tuple[str, int]]]:
    """Parse PDF bytes → (page texts, outline).

    Returns per-page extracted text (raw, pre-normalization) and the
    flattened outline as (title, 1-based page_no) in document order.
    """
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF: missing %PDF header")
    objs = _parse_objects(data)
    order = _page_order(objs)
    page_index = {num: i + 1 for i, num in enumerate(order)}

    texts: list[str] = []
    for num in order:
        parts: list[str] = []
        for c in _refs(_dict_part(objs[num]), b"/Contents"):
            body = objs.get(c)
            if body is None:
                continue
            stream = _stream_data(body)
            if stream is not None:
                parts.append(_extract_text_from_stream(stream))
        texts.append("\n".join(p for p in parts if p))

    outline: list[tuple[str, int]] = []
    for num, body in objs.items():
        head = _dict_part(body)
        if re.search(rb"/Type\s*/Outlines\b", head):
            first = _refs(head, b"/First")
            cur = first[0] if first else None
            seen: set[int] = set()
            while cur is not None and cur not in seen:
                seen.add(cur)
                item = objs.get(cur)
                if item is None:
                    break
                tm = re.search(rb"/Title\s*(\((?:[^()\\]|\\.)*\))", item)
                title = _decode_pdf_string(tm.group(1)[1:-1]) if tm else ""
                dest = _refs(item, b"/Dest") or _refs(item, b"/D")
                page_no = next(
                    (page_index[d] for d in dest if d in page_index), 0
                )
                if title and page_no:
                    outline.append((title, page_no))
                nxt = _refs(item, b"/Next")
                cur = nxt[0] if nxt else None
            break
    return texts, outline


# ---------------------------------------------------------------------------
# normalization (transformer.py:689-696 semantics)
# ---------------------------------------------------------------------------


def normalize_pdf_text(text: str) -> str:
    """De-hyphenate across line breaks, normalize newlines, collapse
    horizontal whitespace, squeeze 3+ blank lines — the reference's
    ``_normalize_pdf_text`` (transformer.py:689-696) re-expressed."""
    text = "".join(ch for ch in text if not 0xD800 <= ord(ch) <= 0xDFFF)
    text = re.sub(r"-\s*\n\s*", "", text)
    text = text.replace("\r", "\n")
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()
