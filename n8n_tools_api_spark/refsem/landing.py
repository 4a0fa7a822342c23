"""URL-landing classification — the deterministic core of the
reference's URL-scan stage (S3), minus the network.

Parity: app/utils/ocr_utils.py:257-371 ``validate_and_download_url``.
The fetch itself is out of scope per the north_rule (no per-row
service calls from executors — a landing fleet delivers
(url, http_status, content_type, content_length_header, payload) rows
to the bronze table); everything the reference computes AFTER the
bytes arrive is replayed exactly here:

* filename derivation (:272-277): ``basename(urlparse(url).path)`` or
  ``remote_document``, then ``.pdf`` appended when no allowed
  extension (case-insensitive);
* gate order (:285-305): HTTP status → content-length header → actual
  size → empty body, each with the reference's exact message;
* type ladder (:308-334): extension → content-type substring → magic
  sniff, appending the matching extension at each fallback step;
* magic validation (:337-343) with ``Invalid {TYPE} file format -
  incorrect file signature``.

Reference quirks a rebuilder must know (pinned by tests):

* The ``.pdf`` default-extension append (:276-277) makes the
  content-type/magic ladder ALMOST unreachable: after the append the
  filename always carries an allowed extension... except for
  hidden-file basenames like ``/.pdf`` — ``str.endswith('.pdf')`` is
  True so nothing is appended, but ``os.path.splitext`` treats the
  leading dot as part of the NAME (no extension), so the extension
  lookup returns 'unknown' and the ladder runs after all. A PDF served
  from ``https://host/.pdf`` therefore lands as ``.pdf.pdf``.
* The magic SNIFF yields ``jpg`` (dict order pdf→png→jpg→jpeg→tiff,
  :30-36) while the EXTENSION path yields ``jpeg`` (:83-87) — the two
  resolution paths disagree on the label for the same bytes.
* The header and actual size gates share one message; ``50.0MB`` is
  ``MAX_FILE_SIZE/(1024*1024)`` formatted with ``:.1f`` (config.py:24).
"""

from __future__ import annotations

from urllib.parse import urlparse

from .filetypes import MAGIC_BYTES, validate_magic_bytes

MAX_FILE_SIZE = 50 * 1024 * 1024  # config.py:24
OCR_ALLOWED_EXTENSIONS = [".pdf", ".png", ".jpg", ".jpeg", ".tiff"]

MSG_TOO_LARGE = "Remote file too large. Max size: 50.0MB"
MSG_EMPTY = "Empty file downloaded from URL"
MSG_UNKNOWN_TYPE = "Unable to determine file type from URL"


def _basename(path: str) -> str:
    # os.path.basename on POSIX: everything after the last '/'
    return path.rsplit("/", 1)[-1]


def _splitext_ext(name: str) -> str:
    """``os.path.splitext(name)[1]``: the suffix from the last dot,
    unless every character before that dot is itself a dot."""
    stripped = name.lstrip(".")
    dot = stripped.rfind(".")
    if dot == -1:
        return ""
    return stripped[dot:]


def derive_url_filename(url: str) -> str:
    """ocr_utils.py:272-277 — pre-ladder filename."""
    filename = _basename(urlparse(url).path) or "remote_document"
    if not any(filename.lower().endswith(ext)
               for ext in OCR_ALLOWED_EXTENSIONS):
        filename = f"{filename}.pdf"
    return filename


def file_type_from_extension(filename: str) -> str:
    """ocr_utils.py:77-95 — '.jpg'/'.jpeg' → 'jpeg', else the bare
    extension for the allowed set, 'unknown' otherwise."""
    if not filename:
        return "unknown"
    ext = _splitext_ext(filename).lower()
    if ext in (".jpg", ".jpeg"):
        return "jpeg"
    if ext in (".png", ".tiff", ".pdf"):
        return ext[1:]
    return "unknown"


def classify_url_landing(url: str, http_status: int, content_type: str | None,
                         content_length_header: int | None,
                         payload: bytes | None) -> dict:
    """One landed fetch → disposition dict (filename, file_type,
    action 'accept'|'reject', reason). Check order and messages are the
    reference's exactly (ocr_utils.py:285-343)."""
    payload = payload or b""
    filename = derive_url_filename(url)
    if http_status != 200:
        return {"filename": filename, "file_type": "unknown",
                "action": "reject",
                "reason": f"Failed to download file: HTTP {http_status}"}
    if content_length_header is not None \
            and content_length_header > MAX_FILE_SIZE:
        return {"filename": filename, "file_type": "unknown",
                "action": "reject", "reason": MSG_TOO_LARGE}
    if len(payload) > MAX_FILE_SIZE:
        return {"filename": filename, "file_type": "unknown",
                "action": "reject", "reason": MSG_TOO_LARGE}
    if len(payload) == 0:
        return {"filename": filename, "file_type": "unknown",
                "action": "reject", "reason": MSG_EMPTY}

    ct = (content_type or "").lower()
    file_type = file_type_from_extension(filename)
    if file_type == "unknown":
        if "pdf" in ct:
            file_type, filename = "pdf", f"{filename}.pdf"
        elif "png" in ct:
            file_type, filename = "png", f"{filename}.png"
        elif "jpeg" in ct or "jpg" in ct:
            file_type, filename = "jpeg", f"{filename}.jpg"
        elif "tiff" in ct:
            file_type, filename = "tiff", f"{filename}.tiff"
        else:
            for fmt, signatures in MAGIC_BYTES.items():
                if any(payload.startswith(sig) for sig in signatures):
                    file_type, filename = fmt, f"{filename}.{fmt}"
                    break
    if file_type != "unknown" and not validate_magic_bytes(payload, file_type):
        return {"filename": filename, "file_type": file_type,
                "action": "reject",
                "reason": (f"Invalid {file_type.upper()} file format - "
                           "incorrect file signature")}
    if file_type == "unknown":
        return {"filename": filename, "file_type": "unknown",
                "action": "reject", "reason": MSG_UNKNOWN_TYPE}
    return {"filename": filename, "file_type": file_type,
            "action": "accept", "reason": None}
