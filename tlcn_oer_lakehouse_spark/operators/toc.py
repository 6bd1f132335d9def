"""Table-of-contents extraction — the reference's 4-method cascade
(hierarchical/toc_extractor.py:49-348) re-expressed for Spark.

Cascade, in confidence order (first method whose result validates wins):

1. ``pdf_outline`` (0.95) — embedded PDF bookmarks (toc_extractor.py:99-167)
2. ``toc_page``    (0.85) — a printed Contents page parsed for
   ``title .... page`` lines, with median page-offset estimation
   (toc_extractor.py:169-193, 302-328; the reference drives this via
   pdfplumber — here the page texts come from functions/pdfio.py)
3. ``regex``       (0.70) — chapter-heading scan over body pages
   (toc_extractor.py:195-228)
4. ``flat``        (0.50) — fixed-size page ranges (toc_extractor.py:229-249)

Validation (toc_extractor.py:335-348): every chapter start is an int in
[1, total_pages] and starts are monotone non-decreasing.  End pages fill
from the next chapter's start (toc_extractor.py:352-363).

The per-document core is plain Python over (page_no → text) — inherently
row-local, so the Spark operator is an Arrow-batched ``mapInPandas``
over binary PDF payloads: decode → cascade → flatten chapters to rows.
One task per batch of documents, no shuffle, no driver involvement.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Iterator
from statistics import median
from typing import Any

CHAPTER_PATTERNS = [
    re.compile(r"^(chapter|chương|chuong|phần|phan)\s+([0-9]+|[ivxlcdm]+)\b", re.IGNORECASE),
    re.compile(r"^([0-9]+)\.\s+[A-ZÀ-Ỹ]"),
    re.compile(r"^([IVXLCDM]+)\.\s+"),
]

SECTION_PATTERNS = [
    re.compile(r"^\d+\.\d+(\.\d+)?\b"),
    re.compile(r"^(section|mục|muc)\s+\d+", re.IGNORECASE),
]


def _clean_title(title: str) -> str:
    return re.sub(r"\s+", " ", title or "").strip(" .-\t")[:220]


def _is_chapter_title(title: str) -> bool:
    return any(p.match(title.strip()) for p in CHAPTER_PATTERNS)


def _is_section_title(title: str) -> bool:
    return any(p.match(title.strip()) for p in SECTION_PATTERNS)


def _leading_number(text: str) -> int | None:
    m = re.search(r"\b(\d{1,3})\b", text)
    if m:
        return int(m.group(1))
    roman = re.search(r"\b([IVXLCDM]{1,8})\b", text, flags=re.IGNORECASE)
    if roman:
        return _roman_to_int(roman.group(1))
    return None


def _roman_to_int(roman: str) -> int:
    values = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500, "m": 1000}
    total, prev = 0, 0
    for ch in roman.lower()[::-1]:
        val = values.get(ch, 0)
        total = total - val if val < prev else total + val
        prev = max(prev, val)
    return max(1, total)


def _norm_ascii(text: str) -> str:
    nfkd = unicodedata.normalize("NFKD", (text or "").lower())
    s = "".join(ch for ch in nfkd if not unicodedata.combining(ch))
    s = re.sub(r"[^a-z0-9\s]+", " ", s)
    return re.sub(r"\s+", " ", s).strip()


def _clamp(v: int, total_pages: int) -> int:
    return max(1, min(int(v), total_pages))


def _new_chapter(counter: int, title: str, page: int) -> dict[str, Any]:
    return {
        "chapter_id": f"ch{counter:02d}",
        "chapter_number": _leading_number(title) or counter,
        "chapter_title": title,
        "page_start": page,
        "page_end": None,
        "sections": [],
    }


# ---------------------------------------------------------------------------
# the four methods
# ---------------------------------------------------------------------------


def _from_outline(
    outline: list[tuple[str, int]], total_pages: int
) -> list[dict[str, Any]]:
    """Method 1: embedded bookmarks (toc_extractor.py:99-167).  Chapter
    vs section decided by title shape; out-of-range pages dropped."""
    chapters: list[dict[str, Any]] = []
    current: dict[str, Any] | None = None
    counter = 0
    for title, page_no in outline:
        if page_no < 1 or page_no > total_pages:
            continue
        cleaned = _clean_title(title)
        if not cleaned:
            continue
        if _is_chapter_title(cleaned) or current is None:
            counter += 1
            current = _new_chapter(counter, cleaned, page_no)
            chapters.append(current)
            continue
        idx = len(current["sections"]) + 1
        current["sections"].append(
            {
                "section_id": f"{current['chapter_id']}_sec{idx:02d}",
                "section_number": f"{current['chapter_number']}.{idx}",
                "section_title": cleaned,
                "page_start": page_no,
                "page_end": None,
            }
        )
    return chapters


def _is_toc_page(text: str) -> bool:
    if not text:
        return False
    lowered = _norm_ascii(text)
    if any(t in lowered for t in ("table of contents", "contents", "muc luc", "noi dung")):
        return True
    return len(re.findall(r"\.{2,}\s*\d+\s*$", text, flags=re.MULTILINE)) >= 3


def _parse_toc_lines(lines: list[str]) -> list[dict[str, Any]]:
    toc: list[dict[str, Any]] = []
    current: dict[str, Any] | None = None
    counter = 0
    for raw in lines:
        line = re.sub(r"\s+", " ", raw).strip()
        if not line:
            continue
        pm = re.search(r"(\d{1,4})\s*$", line)
        if not pm:
            continue
        page_no = int(pm.group(1))
        head = _clean_title(line[: pm.start()].rstrip(" .-\t"))
        if not head:
            continue
        if _is_chapter_title(head):
            counter += 1
            current = _new_chapter(counter, head, page_no)
            toc.append(current)
        elif _is_section_title(head) and current is not None:
            idx = len(current["sections"]) + 1
            sm = re.search(r"(\d+\.\d+(?:\.\d+)?)", head)
            current["sections"].append(
                {
                    "section_id": f"{current['chapter_id']}_sec{idx:02d}",
                    "section_number": sm.group(1) if sm else f"{current['chapter_number']}.{idx}",
                    "section_title": head,
                    "page_start": page_no,
                    "page_end": None,
                }
            )
    return toc


def _estimate_offset(
    page_texts: dict[int, str], toc: list[dict[str, Any]], total_pages: int
) -> int:
    """Median (physical - logical) page offset from locating the first
    chapters' title tokens in the body (toc_extractor.py:302-328).

    Deliberate divergence from the reference: TOC pages are EXCLUDED
    from the scan.  The reference scans all pages, and since a Contents
    page quotes every chapter title verbatim it always wins the token
    match, anchoring the offset to the TOC page instead of the chapter's
    body page — the estimator could never return a useful offset."""
    scanned = [
        (p, _norm_ascii(t))
        for p, t in sorted(page_texts.items())[:140]
        if t and t.strip() and not _is_toc_page(t)
    ]
    offsets: list[int] = []
    for chapter in toc[:6]:
        title = _norm_ascii(str(chapter.get("chapter_title") or ""))
        tokens = [t for t in re.findall(r"[a-z0-9]+", title) if len(t) > 3][:4]
        logical = int(chapter.get("page_start") or 0)
        if not tokens or logical <= 0:
            continue
        for page_no, text in scanned:
            matches = sum(1 for tok in tokens if tok in text)
            if matches >= max(1, len(tokens) - 1):
                offsets.append(page_no - logical)
                break
    return int(round(median(offsets))) if offsets else 0


def _from_toc_page(
    page_texts: dict[int, str], total_pages: int, toc_scan_pages: int = 12
) -> list[dict[str, Any]]:
    """Method 2: printed Contents page (toc_extractor.py:169-193)."""
    lines: list[str] = []
    for page_no in sorted(page_texts)[:toc_scan_pages]:
        text = (page_texts.get(page_no) or "").strip()
        if text and _is_toc_page(text):
            lines.extend(ln.strip() for ln in text.splitlines() if ln.strip())
    if not lines:
        return []
    toc = _parse_toc_lines(lines)
    if not toc:
        return []
    offset = _estimate_offset(page_texts, toc, total_pages)
    for chapter in toc:
        chapter["page_start"] = _clamp((chapter["page_start"] or 1) + offset, total_pages)
        for s in chapter["sections"]:
            s["page_start"] = _clamp(
                (s["page_start"] or chapter["page_start"]) + offset, total_pages
            )
    return toc


def _from_regex(page_texts: dict[int, str], total_pages: int) -> list[dict[str, Any]]:
    """Method 3: chapter-heading scan (toc_extractor.py:195-228) — first
    matching line per page starts a chapter."""
    chapters: list[dict[str, Any]] = []
    counter = 0
    for page_no in sorted(page_texts):
        text = (page_texts.get(page_no) or "").strip()
        if not text:
            continue
        for line in text.splitlines():
            head = _clean_title(line)
            if head and _is_chapter_title(head):
                counter += 1
                chapters.append(_new_chapter(counter, head, page_no))
                break
    return chapters


def _flat_toc(total_pages: int, chapter_size: int) -> list[dict[str, Any]]:
    """Method 4: fixed page ranges (toc_extractor.py:229-249)."""
    toc = []
    num = 0
    for start in range(1, total_pages + 1, chapter_size):
        num += 1
        toc.append(
            {
                "chapter_id": f"ch{num:02d}",
                "chapter_number": num,
                "chapter_title": f"Part {num}",
                "page_start": start,
                "page_end": min(start + chapter_size - 1, total_pages),
                "sections": [],
            }
        )
    return toc


# ---------------------------------------------------------------------------
# validation + cascade
# ---------------------------------------------------------------------------


def validate_toc(toc: list[dict[str, Any]], total_pages: int) -> bool:
    """toc_extractor.py:335-348: non-empty, int starts in range, monotone."""
    if not toc:
        return False
    starts = []
    for chapter in toc:
        s = chapter.get("page_start")
        if not isinstance(s, int) or s < 1 or s > total_pages:
            return False
        starts.append(s)
    return starts == sorted(starts)


def _fill_end_pages(toc: list[dict[str, Any]], total_pages: int) -> None:
    for i, chapter in enumerate(toc):
        nxt = toc[i + 1]["page_start"] if i < len(toc) - 1 else total_pages + 1
        chapter["page_end"] = max(chapter.get("page_start", 1), _clamp(nxt - 1, total_pages))
        secs = chapter.get("sections") or []
        for j, s in enumerate(secs):
            nxt_s = secs[j + 1]["page_start"] if j < len(secs) - 1 else chapter["page_end"] + 1
            s["page_end"] = max(s.get("page_start", chapter["page_start"]), _clamp(nxt_s - 1, total_pages))


def extract_toc(
    page_texts: dict[int, str],
    outline: list[tuple[str, int]] | None = None,
    total_pages: int | None = None,
    fallback_chapter_size: int = 50,
    toc_scan_pages: int = 12,
) -> dict[str, Any]:
    """The full cascade (toc_extractor.py:49-97): first validating method
    wins; flat fallback always validates."""
    total = total_pages if total_pages is not None else (max(page_texts) if page_texts else 0)
    if total <= 0:
        return {"method": "flat", "confidence": 0.0, "toc": [],
                "total_pages": 0, "structure_valid": False}

    for method, confidence, toc in (
        ("pdf_outline", 0.95, _from_outline(outline or [], total)),
        ("toc_page", 0.85, _from_toc_page(page_texts, total, toc_scan_pages)),
        ("regex", 0.70, _from_regex(page_texts, total)),
    ):
        if validate_toc(toc, total):
            _fill_end_pages(toc, total)
            return {"method": method, "confidence": confidence, "toc": toc,
                    "total_pages": total, "structure_valid": True}

    toc = _flat_toc(total, max(10, fallback_chapter_size))
    _fill_end_pages(toc, total)
    return {"method": "flat", "confidence": 0.50, "toc": toc,
            "total_pages": total, "structure_valid": validate_toc(toc, total)}


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

TOC_ROW_SCHEMA = (
    "doc_id long, method string, confidence double, total_pages int, "
    "chapter_id string, chapter_number int, chapter_title string, "
    "page_start int, page_end int, n_sections int"
)


def toc_from_pdfs(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Arrow-batched TOC extraction over binary PDF payloads: one output
    row per chapter.  Decode + cascade run inside the task — the 1→N
    chapter fan-out introduces no shuffle."""
    import pandas as pd

    from tlcn_oer_lakehouse_spark.functions.pdfio import read_pdf

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            rows: list[dict] = []
            for doc_id, payload in zip(pdf_batch[id_col], pdf_batch[payload_col]):
                pages, outline = read_pdf(bytes(payload))
                page_texts = {i + 1: t for i, t in enumerate(pages)}
                result = extract_toc(page_texts, outline, len(pages))
                for ch in result["toc"]:
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "method": result["method"],
                            "confidence": result["confidence"],
                            "total_pages": result["total_pages"],
                            "chapter_id": ch["chapter_id"],
                            "chapter_number": int(ch["chapter_number"]),
                            "chapter_title": ch["chapter_title"],
                            "page_start": int(ch["page_start"]),
                            "page_end": int(ch["page_end"]),
                            "n_sections": len(ch["sections"]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "method", "confidence", "total_pages",
                    "chapter_id", "chapter_number", "chapter_title",
                    "page_start", "page_end", "n_sections",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(_extract, schema=TOC_ROW_SCHEMA)
