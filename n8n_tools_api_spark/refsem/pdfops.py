"""PDF-operation arithmetic (SURVEY.md §2.2 P1-P2/P5, §2.4 A2-A3,
§2.5 W3-W4, §2.6 split naming).

Pure span-level arithmetic — no PDF bytes here. The byte-level parse
stage lives in operators/pdf_bronze.py; everything below operates on
page *counts* and page *indices* and is what the reference's unit-test
matrix (tests/unit/test_pdf_service.py:51-108) actually pins down.
"""

from __future__ import annotations

import re


class PageRangeError(ValueError):
    """Raised on malformed / out-of-bounds page ranges.

    Parity: PDFProcessingError paths in pdf_service.py:32-65 — the error
    messages are kept verbatim so error-side-channel rows match.
    """


def parse_page_range(page_range: str, total_pages: int) -> tuple[int, int]:
    """``"5"`` → (4,4); ``"3-7"`` → (2,6); open ends default to 1/total.

    Parity: pdf_service.py:32-65 (_parse_page_range). Returns 0-based
    inclusive (start, end). Raises PageRangeError for non-numeric input,
    pages < 1, pages > total, and reversed ranges — with the reference's
    exact messages.
    """
    page_range = page_range.strip()
    if "-" not in page_range:
        try:
            page_num = int(page_range)
        except ValueError:
            raise PageRangeError(f"Invalid page range format: {page_range}")
        if page_num < 1 or page_num > total_pages:
            raise PageRangeError(
                f"Page {page_num} is out of range (1-{total_pages})"
            )
        return page_num - 1, page_num - 1

    parts = page_range.split("-", 1)
    if len(parts) != 2:
        raise PageRangeError(f"Invalid page range format: {page_range}")
    try:
        start = int(parts[0].strip()) if parts[0].strip() else 1
        end = int(parts[1].strip()) if parts[1].strip() else total_pages
    except ValueError:
        raise PageRangeError(f"Invalid page numbers in range: {page_range}")
    if start < 1 or end < 1:
        raise PageRangeError("Page numbers must be greater than 0")
    if start > total_pages or end > total_pages:
        raise PageRangeError(
            f"Page range {start}-{end} exceeds document length ({total_pages} pages)"
        )
    if start > end:
        raise PageRangeError(
            f"Invalid range: start page ({start}) is greater than end page ({end})"
        )
    return start - 1, end - 1


def parse_range_list(ranges: str) -> list[str]:
    """Comma-split a range list, trimming and dropping empties.

    Parity: app/api/routes/pdf.py:142-144.
    """
    return [r.strip() for r in ranges.split(",") if r.strip()]


def split_output_name(start_idx: int, end_idx: int) -> str:
    """Output filename for a range split (0-based inclusive indices).

    Parity: pdf_service.py:110-113 — ``page_{n}.pdf`` for single pages,
    ``pages_{a}-{b}.pdf`` otherwise (1-based in the name).
    """
    if start_idx == end_idx:
        return f"page_{start_idx + 1}.pdf"
    return f"pages_{start_idx + 1}-{end_idx + 1}.pdf"


def filename_base(original_filename: str) -> str:
    """Parity: pdf_service.py:724 — strip the last extension only."""
    return (
        original_filename.rsplit(".", 1)[0]
        if "." in original_filename
        else original_filename
    )


def batch_windows(total_pages: int, batch_size: int,
                  original_filename: str = "document.pdf") -> list[dict]:
    """Page windows + filenames for a batch split.

    Parity: pdf_service.py:692-758 (split_into_batches):
    ``batch_count = ceil(total/batch)`` via the reference's integer
    formula; names ``{base}_batch_{k}_page_{p}.pdf`` for single-page
    batches, ``{base}_batch_{k}_pages_{a}-{b}.pdf`` otherwise. Windows
    are 1-based inclusive in the output dicts.
    """
    if batch_size <= 0:
        raise PageRangeError("Batch size must be greater than 0")
    if total_pages <= 0:
        raise PageRangeError("PDF has no pages")
    batch_count = (total_pages + batch_size - 1) // batch_size
    base = filename_base(original_filename)
    out: list[dict] = []
    for batch_num in range(batch_count):
        start_page = batch_num * batch_size          # 0-based
        end_page = min((batch_num + 1) * batch_size, total_pages)  # exclusive
        if start_page + 1 == end_page:
            name = f"{base}_batch_{batch_num + 1}_page_{start_page + 1}.pdf"
        else:
            name = f"{base}_batch_{batch_num + 1}_pages_{start_page + 1}-{end_page}.pdf"
        out.append({
            "batch_index": batch_num + 1,
            "out_name": name,
            "page_lo": start_page + 1,
            "page_hi": end_page,
        })
    return out


def merge_append_order(page_counts: list[int]) -> list[tuple[int, int]]:
    """Output page order for an append merge: (file_idx, page_idx) pairs.

    Parity: pdf_service.py:398-431 (_merge_append) — all pages of file 0,
    then file 1, … Metadata comes from the first file (handled by caller).
    """
    order: list[tuple[int, int]] = []
    for file_idx, n in enumerate(page_counts):
        for page_idx in range(n):
            order.append((file_idx, page_idx))
    return order


def merge_interleave_order(page_counts: list[int]) -> list[tuple[int, int]]:
    """Output page order for an interleave merge.

    Parity: pdf_service.py:433-473 (_merge_interleave) — page p of each
    file in file order for p = 0..max-1, skipping exhausted files.
    """
    order: list[tuple[int, int]] = []
    max_pages = max(page_counts, default=0)
    for page_num in range(max_pages):
        for file_idx, n in enumerate(page_counts):
            if page_num < n:
                order.append((file_idx, page_num))
    return order


def split_pages(total_pages: int) -> list[dict]:
    """One output row per page for an individual-page split.

    Parity: pdf_service.py:158-232 (split_to_individual_pages) — names
    ``page_{n}.pdf`` with 1-based numbering; zero pages raises the
    reference's "PDF has no pages" error.
    """
    if total_pages <= 0:
        raise PageRangeError("PDF has no pages")
    return [
        {"page_num": i + 1, "out_name": f"page_{i + 1}.pdf"}
        for i in range(total_pages)
    ]


def merge_pages_order(specs: list[tuple[int, list[int]]]) -> list[dict]:
    """Output order for a merge with per-file page selection.

    Parity: pdf_service.py:476-546 (merge_with_page_selection) + the
    route zip at pdf.py:680 — specs[i] = (n_pages, selected 1-based
    page numbers for the file at zip position i). Files with an empty
    selection are skipped entirely; out-of-range pages are *skipped
    with a warning* (not an error), with the reference's message.

    Returns rows {file_pos (0-based zip position), sel_pos, page_num,
    out_pos (None when skipped), error (None when added)}.
    """
    rows: list[dict] = []
    out_pos = 0
    for i, (n_pages, selected) in enumerate(specs):
        if not selected:
            continue  # reference: `if not page_indices: continue`
        for j, page_num in enumerate(selected):
            if page_num < 1 or page_num > n_pages:
                rows.append({
                    "file_pos": i, "sel_pos": j, "page_num": page_num,
                    "out_pos": None,
                    "error": (
                        f"Page {page_num} is out of range for PDF {i + 1} "
                        f"(has {n_pages} pages). Skipping."
                    ),
                })
                continue
            rows.append({
                "file_pos": i, "sel_pos": j, "page_num": page_num,
                "out_pos": out_pos, "error": None,
            })
            out_pos += 1
    return rows


def merge_ranges_order(specs: list[tuple[int, list[str]]]) -> list[dict]:
    """Output order for a merge with per-file range strings.

    Parity: pdf_service.py:548-621 (merge_with_ranges) — specs[i] =
    (n_pages, range strings). Invalid ranges are skipped whole with a
    warning (reference logs and `continue`s); valid ranges expand to
    their pages in order. Files with no ranges are skipped.

    Returns rows {file_pos, range_pos, page_range, page_num (1-based,
    None for skipped ranges), out_pos (None when skipped), error}.
    """
    rows: list[dict] = []
    out_pos = 0
    for i, (n_pages, ranges) in enumerate(specs):
        if not ranges:
            continue
        for j, rng in enumerate(ranges):
            try:
                lo, hi = parse_page_range(rng, n_pages)
            except PageRangeError as e:
                rows.append({
                    "file_pos": i, "range_pos": j, "page_range": rng,
                    "page_num": None, "out_pos": None,
                    "error": (
                        f"Skipping invalid range '{rng}' for PDF {i + 1}: {e}"
                    ),
                })
                continue
            for p in range(lo, hi + 1):  # 0-based inclusive from parser
                rows.append({
                    "file_pos": i, "range_pos": j, "page_range": rng,
                    "page_num": p + 1, "out_pos": out_pos, "error": None,
                })
                out_pos += 1
    return rows


def batch_split_info(total_pages: int, batch_size: int,
                     file_size_bytes: int) -> dict:
    """Batch-split preview rollup.

    Parity: pdf_service.py:760-816 (get_batch_split_info) — batch
    count/windows plus file_size_mb and the ×1.1 estimated output size
    (both round(x, 2); the reference's Python round is banker's, noted
    for the column twin which uses HALF_UP — callers keep test values
    off the .xx5 midpoints, as merge_info does).
    """
    if batch_size <= 0:
        raise PageRangeError("Batch size must be greater than 0")
    if total_pages <= 0:
        raise PageRangeError("PDF has no pages")
    batch_count = (total_pages + batch_size - 1) // batch_size
    mb = file_size_bytes / (1024 * 1024)
    return {
        "total_pages": total_pages,
        "batch_size": batch_size,
        "batch_count": batch_count,
        "file_size_bytes": file_size_bytes,
        "file_size_mb": round(mb, 2),
        "estimated_total_output_size_mb": round(mb * 1.1, 2),
    }


_RE_UNSAFE = re.compile(r"[^a-zA-Z0-9._-]")


def sanitize_filename(filename: str, fallback: str = "document") -> str:
    """Basename + unsafe-char scrub + length cap.

    Parity: file_utils.py:24-50 (sanitize_filename), with the uuid
    fallback replaced by a caller-supplied deterministic name
    (SURVEY.md §7.3 — non-determinism is excluded from the invariant).
    """
    if not filename:
        return f"{fallback}.pdf"
    name = filename.replace("\\", "/").rsplit("/", 1)[-1]
    name = _RE_UNSAFE.sub("_", name)
    if not name or name.startswith("."):
        name = f"{fallback}.pdf"
    if not name.lower().endswith(".pdf"):
        name += ".pdf"
    if len(name) > 255:
        keep = 255 - 4
        name = name[:keep] + ".pdf"
    return name
