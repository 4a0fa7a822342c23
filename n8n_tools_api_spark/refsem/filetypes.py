"""File-type detection by magic bytes (SURVEY.md §2.1 S2, §2.8 F17).

Parity: app/utils/ocr_utils.py:30-36 (MAGIC_BYTES — both TIFF endians)
and :97-103 (validate_magic_bytes); content types :42-48.
"""

from __future__ import annotations

MAGIC_BYTES: dict[str, tuple[bytes, ...]] = {
    "pdf": (b"%PDF",),
    "png": (b"\x89PNG\r\n\x1a\n",),
    "jpg": (b"\xff\xd8\xff",),
    "jpeg": (b"\xff\xd8\xff",),
    "tiff": (b"II*\x00", b"MM\x00*"),  # little- and big-endian
}

CONTENT_TYPES = {
    "pdf": "application/pdf",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "tiff": "image/tiff",
}


def validate_magic_bytes(content: bytes, file_type: str) -> bool:
    """Parity: ocr_utils.py:97-103."""
    if file_type not in MAGIC_BYTES:
        return False
    return any(content.startswith(sig) for sig in MAGIC_BYTES[file_type])


def detect_file_type(content: bytes) -> str:
    """Magic-sniffing order pdf → png → jpg → tiff (first match wins);
    'unknown' otherwise. Derived from the content-sniffing fallback in
    ocr_utils.py:315-334 (URL scan type inference)."""
    if not content:
        return "unknown"
    for ftype in ("pdf", "png", "jpg", "tiff"):
        if validate_magic_bytes(content, ftype):
            return ftype
    return "unknown"
