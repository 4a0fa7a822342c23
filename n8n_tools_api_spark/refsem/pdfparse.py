"""Minimal PDF byte-stream parsing + generation (from scratch).

The reference parses PDFs with pypdf (pdf_service.py:84-102); this
container has no PDF library, so the bronze stage implements the subset
of ISO 32000 the reference's own test fixtures exercise
(tests/conftest.py:44-117, tests/fixtures/sample_files.py:15-260 build
PDFs byte-by-byte: catalog → pages tree → Helvetica font → BT/Tj/ET
content streams → xref → trailer; optional /Info metadata dict and
FlateDecode streams):

* header/trailer validation — parity file_utils.py:91-96 (``%PDF``
  magic, ``%%EOF`` within the file tail);
* object scan + page-tree walk (``/Type /Pages`` → ``/Kids`` order);
* content-stream text-object decoding: ``(…) Tj`` and ``[…] TJ`` with
  PDF string escapes, FlateDecode via zlib;
* metadata record — parity pdf_service.py:233-280 (page_count, sizes,
  MB rounding, /Info key cleanup F14, MediaBox points→inches /72 F12).

``build_pdf`` mirrors the reference's generator so tests have
deterministic fixtures covering 1..50-page, metadata, compressed,
corrupted, and invalid variants.
"""

from __future__ import annotations

import re
import zlib

MAX_PDF_BYTES = 50 * 1024 * 1024  # app/core/config.py:24

_RE_OBJ_HEAD = re.compile(rb"(\d+)\s+(\d+)\s+obj")
_RE_STREAM_START = re.compile(rb"stream(\r\n|\n|\r)")
# direct /Length only; an indirect "/Length 12 0 R" falls back to the
# endstream scan. (?!\d) stops backtracking from shrinking the digit
# group until the indirect-ref lookahead passes ('12 0 R' would
# otherwise match as direct length 1 — review finding)
_RE_LENGTH = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)")
_RE_PAGES_KIDS = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_RE_REF = re.compile(rb"(\d+)\s+0\s+R")
_RE_CONTENTS = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_RE_TJ = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*Tj|\[(?:[^\[\]\\]|\\.)*\]\s*TJ")
_RE_PDF_STRING = re.compile(rb"\((?:[^()\\]|\\.)*\)")
_RE_INFO_REF = re.compile(rb"/Info\s+(\d+)\s+0\s+R")
_RE_INFO_ENTRY = re.compile(rb"/(\w+)\s*\(((?:[^()\\]|\\.)*)\)")
_RE_MEDIABOX = re.compile(
    rb"/MediaBox\s*\[\s*([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)\s*\]")

_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}


class PdfParseError(ValueError):
    pass


def validate_pdf_bytes(content: bytes) -> bool:
    """Magic + trailer check — parity file_utils.py:91-96."""
    if not content or len(content) > MAX_PDF_BYTES:
        return False
    if not content.startswith(b"%PDF"):
        return False
    return b"%%EOF" in content[-1024:]


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                digits = b""
                while j < len(raw) and raw[j:j + 1].isdigit() and len(digits) < 3:
                    digits += raw[j:j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            out += nxt
            i += 2
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _objects(content: bytes) -> dict[int, bytes]:
    """Sequential object scan, /Length-aware.

    A naive ``obj(.*?)endobj`` regex truncates whenever compressed
    stream bytes happen to contain ``endobj``/``endstream`` (or end in
    ``\\r``, which a ``\\r?\\n endstream`` separator would eat —
    hypothesis found both). When a stream dict carries a direct
    /Length, the scan skips exactly that many data bytes before
    looking for endstream/endobj, so arbitrary binary payloads survive.
    """
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _RE_OBJ_HEAD.search(content, pos)
        if not m:
            return objs
        start = m.end()
        eo = content.find(b"endobj", start)
        sm = _RE_STREAM_START.search(content, start)
        if sm is not None and (eo == -1 or sm.start() < eo):
            lm = _RE_LENGTH.search(content[start:sm.start()])
            scan_from = sm.end() + int(lm.group(1)) if lm else sm.end()
            es = content.find(b"endstream", scan_from)
            if es != -1:
                eo = content.find(b"endobj", es)
        if eo == -1:
            objs[int(m.group(1))] = content[start:]
            return objs
        objs[int(m.group(1))] = content[start:eo]
        pos = eo + 6


def _stream_bytes(body: bytes) -> bytes:
    sm = _RE_STREAM_START.search(body)
    if not sm:
        return b""
    header = body[:sm.start()]
    ds = sm.end()
    lm = _RE_LENGTH.search(header)
    if lm:
        data = body[ds:ds + int(lm.group(1))]
    else:
        es = body.find(b"endstream", ds)
        data = body[ds:es] if es != -1 else body[ds:]
        # the EOL before endstream is a separator, not data (PDF 7.3.8)
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n"):
            data = data[:-1]
    if b"/FlateDecode" in header:
        try:
            data = zlib.decompress(data)
        except zlib.error as e:
            raise PdfParseError(f"bad FlateDecode stream: {e}")
    return data


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Page object ids in /Kids order (page tree walk)."""
    for body in objs.values():
        if b"/Type" in body and b"/Pages" in body:
            kids = _RE_PAGES_KIDS.search(body)
            if kids:
                order = [int(m.group(1)) for m in _RE_REF.finditer(kids.group(1))]
                # tolerate nested page trees one level deep
                flat: list[int] = []
                for oid in order:
                    kid_body = objs.get(oid, b"")
                    if b"/Type" in kid_body and b"/Pages" in kid_body:
                        sub = _RE_PAGES_KIDS.search(kid_body)
                        if sub:
                            flat.extend(int(m.group(1))
                                        for m in _RE_REF.finditer(sub.group(1)))
                    else:
                        flat.append(oid)
                return flat
    # fallback: objects that look like pages, in object-id order
    return sorted(
        oid for oid, body in objs.items()
        if b"/Type" in body and b"/Page" in body and b"/Pages" not in body
    )


def _page_text(objs: dict[int, bytes], page_body: bytes) -> str:
    m = _RE_CONTENTS.search(page_body)
    stream = b""
    if m:
        stream = _stream_bytes(objs.get(int(m.group(1)), b""))
    else:
        stream = _stream_bytes(page_body)  # inline contents
    pieces: list[str] = []
    for tok in _RE_TJ.finditer(stream):
        for s in _RE_PDF_STRING.finditer(tok.group(0)):
            pieces.append(_unescape_pdf_string(s.group(0)[1:-1]))
    return "".join(pieces)


def parse_pdf_pages(content: bytes) -> list[str]:
    """Page texts in page-tree order. Raises PdfParseError on garbage."""
    if not validate_pdf_bytes(content):
        raise PdfParseError("not a valid PDF (magic/EOF check failed)")
    objs = _objects(content)
    if not objs:
        raise PdfParseError("no PDF objects found")
    order = _page_order(objs)
    if not order:
        raise PdfParseError("no pages found")
    return [_page_text(objs, objs.get(oid, b"")) for oid in order]


def get_pdf_metadata(content: bytes) -> dict:
    """Metadata record — parity pdf_service.py:233-280 (get_metadata):
    page_count, file sizes (MB = round(b/1048576, 2)), /Info dict with
    keys stripped of the leading '/' (F14), first-page dimensions in
    points and inches (/72, round 2 — F12)."""
    pages = parse_pdf_pages(content)
    objs = _objects(content)
    meta: dict = {
        "page_count": len(pages),
        "file_size_bytes": len(content),
        "file_size_mb": round(len(content) / 1048576, 2),
        "encrypted": b"/Encrypt" in content,
        "metadata": {},
        "page_dimensions": None,
    }
    info_ref = _RE_INFO_REF.search(content)
    if info_ref:
        body = objs.get(int(info_ref.group(1)), b"")
        for m in _RE_INFO_ENTRY.finditer(body):
            key = m.group(1).decode("latin-1").lstrip("/")
            meta["metadata"][key] = _unescape_pdf_string(m.group(2))
    order = _page_order(objs)
    if order:
        mb = _RE_MEDIABOX.search(objs.get(order[0], b""))
        if not mb:
            mb = _RE_MEDIABOX.search(content)
        if mb:
            x0, y0, x1, y1 = (float(mb.group(i)) for i in (1, 2, 3, 4))
            width, height = x1 - x0, y1 - y0
            meta["page_dimensions"] = {
                "width": width, "height": height,
                "width_inches": round(width / 72, 2),
                "height_inches": round(height / 72, 2),
            }
    return meta


# ---------------------------------------------------------------------------
# generator (mirrors the reference's test fixture builder)
# ---------------------------------------------------------------------------

def build_pdf(page_texts: list[str], title: str | None = None,
              author: str | None = None, compress: bool = False) -> bytes:
    """Byte-by-byte minimal PDF, one Tj text object per page.

    Structure mirrors tests/conftest.py:44-117 (catalog, pages tree,
    Helvetica font, BT/Tj/ET content streams, xref, trailer) with
    optional /Info (sample_files.py:86-145) and FlateDecode.
    """
    objects: list[bytes] = []

    def esc(s: str) -> bytes:
        return (s.replace("\\", r"\\").replace("(", r"\(")
                 .replace(")", r"\)")).encode("latin-1", "replace")

    n_pages = len(page_texts)
    # object ids: 1 catalog, 2 pages, 3 font, 4..3+n pages, 4+n..3+2n contents,
    # (last) info
    page_ids = [4 + i for i in range(n_pages)]
    content_ids = [4 + n_pages + i for i in range(n_pages)]
    info_id = 4 + 2 * n_pages if (title or author) else None

    kids = b" ".join(b"%d 0 R" % pid for pid in page_ids)
    objects.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objects.append((2, b"<< /Type /Pages /Kids [" + kids +
                    b"] /Count %d >>" % n_pages))
    objects.append((3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    for pid, cid in zip(page_ids, content_ids):
        objects.append((pid,
                        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                        b"/Contents %d 0 R /Resources << /Font << /F1 3 0 R >> >> >>" % cid))
    for cid, text in zip(content_ids, page_texts):
        stream = b"BT /F1 12 Tf 72 720 Td (" + esc(text) + b") Tj ET"
        if compress:
            comp = zlib.compress(stream)
            obj = (b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
                   + comp + b"\nendstream")
        else:
            obj = (b"<< /Length %d >>\nstream\n" % len(stream)
                   + stream + b"\nendstream")
        objects.append((cid, obj))
    if info_id:
        entries = b""
        if title:
            entries += b"/Title (" + esc(title) + b") "
        if author:
            entries += b"/Author (" + esc(author) + b") "
        objects.append((info_id, b"<< " + entries + b">>"))

    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for oid, body in objects:
        offsets[oid] = len(out)
        out += b"%d 0 obj\n" % oid + body + b"\nendobj\n"
    xref_pos = len(out)
    max_id = max(offsets)
    out += b"xref\n0 %d\n" % (max_id + 1)
    out += b"0000000000 65535 f \n"
    for oid in range(1, max_id + 1):
        out += b"%010d 00000 n \n" % offsets.get(oid, 0)
    trailer = b"trailer\n<< /Size %d /Root 1 0 R" % (max_id + 1)
    if info_id:
        trailer += b" /Info %d 0 R" % info_id
    trailer += b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    out += trailer
    return bytes(out)
